"""Offline WAV renderer CLI — the write_wav.zig equivalent.

    python -m zang_tpu.host.render_wav song out.wav [--seconds N]
                                                    [--engine tpu|oracle]
                                                    [--chunk N]

Configs:
  song      full Bach Toccata & Fugue (48 kHz mono, 385 s by default)
"""

import argparse
import sys
import time

import numpy as np

from ..core.wav import write_wav_s16
from ..core.mixdown import mixdown_s16_np
from . import song as song_mod


def main(argv=None):
    ap = argparse.ArgumentParser(prog="zang-render", description=__doc__)
    ap.add_argument("config", choices=["song"])
    ap.add_argument("output")
    ap.add_argument("--seconds", type=float, default=None)
    ap.add_argument("--engine", choices=["tpu", "oracle", "oracle-exact"], default="tpu")
    ap.add_argument("--chunk", type=int, default=65536)
    args = ap.parse_args(argv)

    seconds = args.seconds if args.seconds is not None else song_mod.NUM_SECONDS
    sr = int(song_mod.SAMPLE_RATE)

    t0 = time.time()
    if args.engine == "tpu":
        mix = song_mod.render_song(seconds, chunk_size=args.chunk)
    else:
        mode = "parity" if args.engine == "oracle" else "exact"
        mix = song_mod.render_song_oracle(seconds, mode=mode)
    dt = time.time() - t0
    pcm = mixdown_s16_np(mix, song_mod.MIX_VOLUME)
    write_wav_s16(args.output, pcm, sr)
    peak = float(np.abs(mix).max())
    print(
        f"rendered {seconds:.0f}s at {sr}Hz with engine={args.engine} in {dt:.2f}s "
        f"(RTF {seconds / dt:.0f}x incl. compile), peak {peak:.3f} -> {args.output}"
    )


if __name__ == "__main__":
    main()
