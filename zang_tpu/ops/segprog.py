"""Segment programs: host-compiled piecewise tables + chunk-local slicing.

A SegProgram is the host-side product of "events become data": per voice, a
sorted table of segment start frames plus named per-segment values (note
freq, u32 phase coefficients, envelope stage coefficients, ...). The
renderer slices programs per render chunk (so the device-side evaluation is
O(K_chunk * n) masked delta sums — see ops.scan.pconst_multi — with
K_chunk ~ tens, instead of O(K_song) or a slow gather).
"""

from dataclasses import dataclass
from typing import Dict

import numpy as np

import jax.numpy as jnp

from .scan import pconst_multi


@dataclass
class SegProgram:
    """starts: [V, K] int64 sorted per voice; values: {name: [V, K]}."""

    starts: np.ndarray
    values: Dict[str, np.ndarray]

    @property
    def num_voices(self) -> int:
        return self.starts.shape[0]


@dataclass
class ChunkedSegProgram:
    """Per-chunk slices, ready to be lax.scan xs: [n_chunks, V, K_chunk]."""

    starts: np.ndarray  # int32
    values: Dict[str, np.ndarray]


def chunkify(sp: SegProgram, chunk_size: int, n_chunks: int, total: int) -> ChunkedSegProgram:
    """Slice a SegProgram into per-chunk windows.

    Each chunk window contains the segment covering the chunk start plus all
    segments starting inside the chunk, padded to the max count with
    start=total (never selected) and repeated values (zero delta).
    """
    V, K = sp.starts.shape
    c0s = np.arange(n_chunks, dtype=np.int64) * chunk_size
    firsts = np.empty((n_chunks, V), dtype=np.int64)
    lasts = np.empty((n_chunks, V), dtype=np.int64)
    for v in range(V):
        s = sp.starts[v]
        firsts[:, v] = np.maximum(np.searchsorted(s, c0s, side="right") - 1, 0)
        lasts[:, v] = np.searchsorted(s, c0s + chunk_size, side="left")
    counts = np.maximum(lasts - firsts, 1)
    Kc = int(counts.max())
    idx = firsts[:, :, None] + np.arange(Kc)[None, None, :]  # [nc, V, Kc]
    in_window = idx < lasts[:, :, None]
    idx_vals = np.minimum(np.maximum(idx, 0), np.maximum(lasts - 1, 0)[:, :, None])
    idx_vals = np.minimum(idx_vals, K - 1)
    starts_c = np.where(
        in_window,
        np.take_along_axis(
            np.broadcast_to(sp.starts[None], (n_chunks, V, K)), np.minimum(idx, K - 1), axis=2
        ),
        np.int64(total),
    )
    values_c = {}
    for name, arr in sp.values.items():
        values_c[name] = np.take_along_axis(
            np.broadcast_to(arr[None], (n_chunks, V, K)), idx_vals, axis=2
        ).copy()
    return ChunkedSegProgram(starts=starts_c.astype(np.int32), values=values_c)


def eval_chunk(chunk_prog: dict, t_idx: jnp.ndarray) -> dict:
    """Device: evaluate one chunk's program slice at t_idx [n] -> {name: [V, n]}.

    chunk_prog: {"starts": [V, Kc] i32, "<name>": [V, Kc], ...} (device arrays,
    typically a lax.scan xs slice).
    """
    values = {k: v for k, v in chunk_prog.items() if k != "starts"}
    return pconst_multi(chunk_prog["starts"], values, t_idx)
