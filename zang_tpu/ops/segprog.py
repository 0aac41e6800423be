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
        # segments starting at/after `total` only affect the trimmed tail
        # (frames >= total) — excluding them keeps padding boundaries out of
        # the final chunk's window, which otherwise inflates the global K
        lasts[:, v] = np.minimum(
            lasts[:, v], max(np.searchsorted(s, total, side="left"), 1)
        )
    counts = np.maximum(lasts - firsts, 1)
    Kc = int(counts.max())
    idx = firsts[:, :, None] + np.arange(Kc)[None, None, :]  # [nc, V, Kc]
    in_window = idx < lasts[:, :, None]
    idx_vals = np.minimum(np.maximum(idx, 0), np.maximum(lasts - 1, 0)[:, :, None])
    idx_vals = np.minimum(idx_vals, K - 1)
    vix = np.arange(V)[None, :, None]
    starts_c = np.where(
        in_window, sp.starts[vix, np.minimum(idx, K - 1)], np.int64(total)
    )
    values_c = {}
    for name, arr in sp.values.items():
        values_c[name] = arr[vix, idx_vals]
    return ChunkedSegProgram(starts=starts_c.astype(np.int32), values=values_c)


def eval_chunk(chunk_prog: dict, t_idx: jnp.ndarray) -> dict:
    """Device: evaluate one chunk's program slice at t_idx [n] -> {name: [V, n]}.

    Two formats:
    - flat:  {"starts": [V, Kc] i32, name: [V, Kc], ...} -> pconst delta sums
    - tiled: {"tb": [V, nt, S] i32, name: [V, nt, S], ...} -> per-tile selects
      (t_idx must be one whole chunk, tile-aligned — the renderer's case)
    """
    if "tb" in chunk_prog:
        return eval_tiled_chunk(chunk_prog, t_idx)
    values = {k: v for k, v in chunk_prog.items() if k != "starts"}
    return pconst_multi(chunk_prog["starts"], values, t_idx)


def chunkify_tiled(
    sp: SegProgram, chunk_size: int, n_chunks: int, total: int, tile: int = 512
) -> dict:
    """Tile-program slicing: per (chunk, voice, tile), the segment covering
    the tile start plus all segments starting inside the tile.

    Device work becomes O(S) selects per sample (S = 1 + max in-tile
    boundary count — typically 2-4) instead of O(K_chunk) delta sums.
    Returns {"tb": [nc, V, nt, S] i32 (boundary starts; slot 0 always
    active), name: [nc, V, nt, S], ...}.
    """
    assert chunk_size % tile == 0
    V, K = sp.starts.shape
    nt = chunk_size // tile
    tile_starts = (
        np.arange(n_chunks, dtype=np.int64)[:, None] * chunk_size
        + np.arange(nt, dtype=np.int64)[None, :] * tile
    ).reshape(-1)  # [nc * nt]
    firsts = np.empty((V, tile_starts.size), dtype=np.int64)
    lasts = np.empty((V, tile_starts.size), dtype=np.int64)
    for v in range(V):
        s = sp.starts[v]
        firsts[v] = np.maximum(np.searchsorted(s, tile_starts, side="right") - 1, 0)
        lasts[v] = np.searchsorted(s, tile_starts + tile, side="left")
        # drop boundaries at/after `total` (trimmed tail): without this the
        # padding rows (start=total) all land in the final tile's window and
        # set the *global* slot count S for every chunk (29-69 vs 2-4 on the
        # Bach song). Tiles past the last real boundary keep its value via
        # the slot-0 clamp below.
        lasts[v] = np.minimum(
            lasts[v], max(np.searchsorted(s, total, side="left"), 1)
        )
    counts = np.maximum(lasts - firsts, 1)
    S = int(counts.max())
    idx = firsts[:, :, None] + np.arange(S)[None, None, :]  # [V, nc*nt, S]
    in_window = idx < lasts[:, :, None]
    idx_v = np.minimum(np.maximum(np.minimum(idx, lasts[:, :, None] - 1), 0), K - 1)
    vix = np.arange(V)[:, None, None]  # direct gather (take_along_axis on a
    # broadcast view walks element-by-element and dominated chunk_xs time)
    tb = np.where(
        in_window,
        sp.starts[vix, np.minimum(idx, K - 1)],
        np.int64(total) + 1,
    )
    # slot 0 covers the tile start: force its boundary to "always active"
    tb[:, :, 0] = -(2 ** 31)
    out = {
        "tb": tb.reshape(V, n_chunks, nt, S).swapaxes(0, 1).astype(np.int32)
    }
    for name, arr in sp.values.items():
        vals = arr[vix, idx_v]
        out[name] = np.ascontiguousarray(
            vals.reshape(V, n_chunks, nt, S).swapaxes(0, 1)
        )
    return out


def eval_tiled_chunk(chunk_prog: dict, t_idx: jnp.ndarray) -> dict:
    """Evaluate a tiled chunk slice ({"tb": [V, nt, S], ...}) over one whole
    chunk (t_idx [n], tile-aligned). Returns {name: [V, n]}."""
    tb = chunk_prog["tb"]
    V, nt, S = tb.shape
    n = t_idx.shape[0]
    tile = n // nt
    t = t_idx.reshape(nt, tile)  # [nt, tile]
    values = {k: v for k, v in chunk_prog.items() if k != "tb"}
    out = {
        name: jnp.broadcast_to(v[:, :, 0:1], (V, nt, tile))
        for name, v in values.items()
    }
    for j in range(1, S):
        mask = t[None, :, :] >= tb[:, :, j][:, :, None]  # [V, nt, tile]
        for name, v in values.items():
            out[name] = jnp.where(mask, v[:, :, j][:, :, None], out[name])
    return {name: o.reshape(V, n) for name, o in out.items()}
