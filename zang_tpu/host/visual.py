"""Visualization data: waveform, FFT spectrum, frequency-synced oscilloscope.

The data-level port of the reference's software visualizer
(examples/visual.zig: DrawSpectrum/DrawWaveform/DrawOscilloscope fed 1024
samples per block, examples/common/fft.zig: iterative radix-2 FFT used at
512 points). SDL rendering is out of scope for an offline framework; these
produce the same frame data (numpy arrays) the widgets would draw, suitable
for tests, dumps, or plotting.
"""

from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np


def fft_radix2(re: np.ndarray, im: np.ndarray) -> None:
    """In-place iterative radix-2 FFT (examples/common/fft.zig:25-60 port:
    bit-reversal permutation + butterfly passes, f32)."""
    n = len(re)
    assert n and (n & (n - 1)) == 0, "power of two"
    # bit reversal
    j = 0
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        if i < j:
            re[i], re[j] = re[j], re[i]
            im[i], im[j] = im[j], im[i]
    length = 2
    while length <= n:
        ang = -2.0 * np.pi / length
        wl_re, wl_im = np.cos(ang), np.sin(ang)
        for i in range(0, n, length):
            w_re, w_im = 1.0, 0.0
            for k in range(length // 2):
                a, b = i + k, i + k + length // 2
                u_re, u_im = re[a], im[a]
                v_re = re[b] * w_re - im[b] * w_im
                v_im = re[b] * w_im + im[b] * w_re
                re[a], im[a] = u_re + v_re, u_im + v_im
                re[b], im[b] = u_re - v_re, u_im - v_im
                w_re, w_im = w_re * wl_re - w_im * wl_im, w_re * wl_im + w_im * wl_re
        length <<= 1


def spectrum_frame(samples: np.ndarray, fft_size: int = 512,
                   log_scale: bool = True) -> np.ndarray:
    """Magnitude spectrum of the first fft_size samples (DrawSpectrum's
    data: |FFT| over the positive bins, optionally logarithmically mapped)."""
    x = np.asarray(samples[:fft_size], dtype=np.float64)
    if len(x) < fft_size:
        x = np.pad(x, (0, fft_size - len(x)))
    re = x.copy()
    im = np.zeros(fft_size)
    fft_radix2(re, im)
    mag = np.sqrt(re * re + im * im)[: fft_size // 2]
    if log_scale:
        mag = np.log1p(mag)
    return mag


def waveform_frame(samples: np.ndarray, width: int = 512) -> np.ndarray:
    """Min/max envelope per pixel column (DrawWaveform): [width, 2]."""
    x = np.asarray(samples, dtype=np.float32)
    n = len(x)
    cols = np.zeros((width, 2), dtype=np.float32)
    for c in range(width):
        lo = c * n // width
        hi = max((c + 1) * n // width, lo + 1)
        seg = x[lo:hi]
        cols[c] = (seg.min(), seg.max())
    return cols


def oscilloscope_frame(samples: np.ndarray, sync_freq: Optional[float],
                       sample_rate: float, width: int = 512) -> np.ndarray:
    """Frequency-synced single-cycle window (DrawOscilloscope with the
    output_sync_oscilloscope channel): start at the first upward zero
    crossing, span one period of sync_freq (or the raw window)."""
    x = np.asarray(samples, dtype=np.float32)
    start = 0
    for i in range(1, len(x)):
        if x[i - 1] <= 0.0 < x[i]:
            start = i
            break
    if sync_freq and sync_freq > 0:
        period = int(round(sample_rate / sync_freq))
        period = max(2, min(period, len(x) - start))
    else:
        period = len(x) - start
    window = x[start : start + period]
    # resample to width columns (nearest)
    idx = np.minimum((np.arange(width) * len(window)) // width, len(window) - 1)
    return window[idx]


@dataclass
class Visuals:
    """Streaming visualizer state: feed audio block by block (the audio
    callback's visuals.newInput flow, examples/example.zig:71-82)."""

    sample_rate: float
    block_size: int = 1024
    fft_size: int = 512

    def frames(self, audio: np.ndarray,
               sync: Optional[np.ndarray] = None) -> Iterator[dict]:
        """Yield one frame dict per block: waveform/spectrum/oscilloscope."""
        n = len(audio)
        for start in range(0, n - self.block_size + 1, self.block_size):
            block = audio[start : start + self.block_size]
            sync_freq = None
            if sync is not None:
                f = float(np.max(sync[start : start + self.block_size]))
                sync_freq = f if f > 0 else None
            yield {
                "start": start,
                "waveform": waveform_frame(block),
                "spectrum": spectrum_frame(block, self.fft_size),
                "oscilloscope": oscilloscope_frame(
                    block, sync_freq, self.sample_rate),
            }
