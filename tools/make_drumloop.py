"""Generate the drum-loop fixture (data/drumloop.wav) deterministically.

A 1.6s four-on-the-floor loop at 22050 Hz: kick (sine sweep), snare (noise
burst + body), hats (short filtered noise). Replaces the reference's binary
fixture with synthesized, reproducible data.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zang_tpu.core.wav import write_wav_s16  # noqa: E402

SR = 22050
BEAT = 0.4  # 150 bpm
LEN = int(4 * BEAT * SR)


def env(n, decay):
    return np.exp(-np.arange(n) / (decay * SR))


def kick(n=int(0.25 * SR)):
    t = np.arange(n) / SR
    freq = 120.0 * np.exp(-t * 18.0) + 45.0
    phase = np.cumsum(freq) / SR
    return np.sin(2 * np.pi * phase) * env(n, 0.12)


def snare(rng, n=int(0.18 * SR)):
    noise = rng.standard_normal(n) * env(n, 0.05)
    t = np.arange(n) / SR
    body = np.sin(2 * np.pi * 190.0 * t) * env(n, 0.04) * 0.6
    return noise * 0.7 + body


def hat(rng, n=int(0.06 * SR)):
    noise = rng.standard_normal(n) * env(n, 0.012)
    return np.diff(noise, prepend=0.0) * 0.8  # crude highpass


def main():
    rng = np.random.default_rng(20260816)
    loop = np.zeros(LEN + SR, dtype=np.float64)

    def add(sig, t):
        i = int(t * SR)
        loop[i : i + len(sig)] += sig

    for beat in range(4):
        add(kick(), beat * BEAT)
        if beat % 2 == 1:
            add(snare(rng), beat * BEAT)
        for eighth in range(2):
            add(hat(rng), beat * BEAT + eighth * BEAT / 2)

    loop = loop[:LEN]
    loop = loop / np.abs(loop).max() * 0.9
    pcm = np.clip(loop * 32767.0, -32767, 32766).astype(np.int16)
    dst = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "zang_tpu", "data", "drumloop.wav")
    write_wav_s16(dst, pcm, SR)
    print(f"wrote {dst}: {LEN} samples at {SR} Hz ({LEN/SR:.2f}s)")


if __name__ == "__main__":
    main()
