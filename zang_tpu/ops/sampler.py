"""Sampler: WAV playback with resampling and looping (src/modules/Sampler.zig).

Host side decodes the raw PCM once into a float32 table (same per-format
conversion rules as the reference's getSample: u8 -> (x-127.5)/127.5,
s16/s24/s32 -> x / 2^(bits-1)) and compiles the playback-position state
machine into a span-granular segment program: the sampler's `t` advances
per paint call (per span) with f32 closed-form arithmetic and wraps at the
*byte* length when looping (the reference's quirk, Sampler.zig:132-134), so
per-span start positions are fully precomputable. The device then evaluates
positions t_i = t0_span + i*ratio and gathers two taps with the reference's
inverted interpolation weights (Sampler.zig:119-125).
"""

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.timeline import SubvoiceTimeline
from ..core.wav import WavData
from .segprog import SegProgram

F32 = np.float32


@dataclass
class SampleTable:
    """Decoded sample: one channel, float32, plus the reference's metadata."""

    data_f32: np.ndarray  # [num_samples]
    num_samples: int
    byte_len: int  # raw data byte length (loop-wrap uses this, quirk)
    sample_rate: float


def decode_wav_channel(w: WavData, channel: int) -> SampleTable:
    raw = np.frombuffer(w.data, dtype=np.uint8)
    bits = w.bits_per_sample
    ch = w.num_channels
    if channel >= ch:
        data = np.zeros(0, dtype=np.float32)
    elif bits == 8:
        data = (raw.astype(np.float32) - F32(127.5)) / F32(127.5)
        data = data[channel::ch]
    elif bits == 16:
        v = np.frombuffer(w.data, dtype="<i2")[channel::ch]
        data = v.astype(np.float32) / F32(32768.0)
    elif bits == 24:
        b = raw.reshape(-1, 3)
        v = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        v = np.where(v >= 1 << 23, v - (1 << 24), v)[channel::ch]
        data = v.astype(np.float32) / F32(8388608.0)
    elif bits == 32:
        v = np.frombuffer(w.data, dtype="<i4")[channel::ch]
        data = v.astype(np.float32) / F32(2147483648.0)
    else:
        raise ValueError(f"unsupported bits {bits}")
    return SampleTable(
        data_f32=np.ascontiguousarray(data),
        num_samples=len(data),
        byte_len=len(w.data),
        sample_rate=float(w.sample_rate),
    )


def plan_sampler(
    tl: SubvoiceTimeline,
    sample: SampleTable,
    sample_rate: float,
    loop: bool,
    block_size: int = 1024,
) -> SegProgram:
    """Compile one subvoice's playback positions into a segment program.

    Values per span segment: t0 (f32 position at span start), mode
    (0 silent, 1 resample, 2 copy fast path).
    """
    ratio = F32(F32(sample.sample_rate) / F32(sample_rate))
    fast = 0.9999 < float(ratio) < 1.0001
    backwards_no_loop = float(ratio) < 0.0 and not loop

    seg_starts: List[int] = [0]
    t0s: List[float] = [0.0]
    modes: List[int] = [0]

    t = F32(0.0)
    total = tl.total
    K = len(tl.starts)
    for k in range(K):
        s = int(tl.starts[k])
        e = int(tl.starts[k + 1]) if k + 1 < K else total
        if bool(tl.resets[k]):
            t = F32(0.0)
        # walk block-aligned spans inside the segment (paint-call granularity)
        pos = s
        while pos < e:
            span_end = min(e, (pos // block_size + 1) * block_size)
            n = span_end - pos
            if backwards_no_loop:
                seg_starts.append(pos)
                t0s.append(float(t))
                modes.append(0)
            elif fast:
                seg_starts.append(pos)
                # Zig std.math.round: half away from zero (not banker's)
                t0s.append(float(np.sign(t) * np.floor(np.abs(t) + F32(0.5))))
                modes.append(2)
                t = F32(t + F32(n))
            else:
                seg_starts.append(pos)
                t0s.append(float(t))
                modes.append(1)
                t = F32(t + F32(F32(n) * ratio))
            if t >= F32(sample.byte_len) and loop:
                t = F32(t - F32(sample.byte_len))
            pos = span_end

    starts = np.array(seg_starts, dtype=np.int64)[None, :]
    values = {
        "t0": np.array(t0s, dtype=np.float32)[None, :],
        "mode": np.array(modes, dtype=np.int32)[None, :],
        "seg_start": np.array(seg_starts, dtype=np.int32)[None, :],
    }
    return SegProgram(starts=starts, values=values)


_WIN_TILE = 512  # output samples per lookup tile (windowed taps)


def windowed_w(ratio: float, tile: int = _WIN_TILE) -> int:
    """Window width covering one tile's position span, rounded to lanes.

    The fast copy path (step 1/sample) only exists when ratio ~ 1
    (plan_sampler's `fast` predicate), so |ratio| alone bounds the span."""
    r = abs(float(ratio))
    span = tile * (max(r, 1.0) if 0.9999 < r < 1.0001 else r) + 4
    return int(-(-max(span, 132.0) // 128) * 128)


def windowed_safe(starts: np.ndarray, num_samples: int, ratio: float,
                  tile: int = _WIN_TILE) -> bool:
    """Host guard for the windowed tap path: every lookup tile must contain
    at most two position clusters (the 2-pass windows then cover it
    exactly). Segment starts closer than a tile can stack 3+ program spans
    (3+ clusters) into one tile -> use the gather path. Also requires the
    table to be wider than the window (the wrap extension slices it)."""
    W = windowed_w(ratio, tile)
    if num_samples < W:
        return False
    for row in np.atleast_2d(starts):
        r = np.asarray(row)
        if len(r) >= 3 and np.any(r[2:] - r[:-2] < tile):
            return False
    return True


def _windowed_taps(idx: jnp.ndarray, ok: jnp.ndarray, table: jnp.ndarray,
                   num_samples: int, W: int) -> jnp.ndarray:
    """Exact table lookup table[idx % N] (ok=False -> 0) without a gather.

    Per 512-sample tile, positions form at most two affine clusters (one
    per program span; guarded by windowed_safe). Two contiguous W-wide
    windows — anchored at the tile's min index and at max-(W-1) — cover
    them, fetched with large-slice DMAs; each sample then selects its value
    by a 0/1 one-hot matmul (exact: a single nonzero f32 term; HIGHEST
    precision keeps the MXU in f32). ~175x faster to compile and ~15%
    faster to run than XLA's elementwise gather on TPU."""
    V, n = idx.shape
    nt = (V * n) // _WIN_TILE
    idx_t = idx.reshape(nt, _WIN_TILE)
    ok_t = ok.reshape(nt, _WIN_TILE)
    base1 = jnp.min(idx_t, axis=1)
    base2 = jnp.max(idx_t, axis=1) - (W - 1)
    tab_ext = jnp.concatenate([table, table[:W]])

    def win(b):
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(tab_ext, (s,), (W,))
        )(jnp.remainder(b, num_samples))

    w1, w2 = win(base1), win(base2)
    o1 = idx_t - base1[:, None]
    o2 = idx_t - base2[:, None]
    ar = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    in1 = o1 < W
    oh1 = ((o1[:, :, None] == ar) & (ok_t & in1)[:, :, None]).astype(jnp.float32)
    oh2 = ((o2[:, :, None] == ar) & (ok_t & ~in1)[:, :, None]).astype(jnp.float32)
    s1 = jnp.einsum("twk,tk->tw", oh1, w1,
                    precision=jax.lax.Precision.HIGHEST)
    s2 = jnp.einsum("twk,tk->tw", oh2, w2,
                    precision=jax.lax.Precision.HIGHEST)
    return (s1 + s2).reshape(V, n)


def eval_sampler(
    vals: dict,
    t_idx: jnp.ndarray,
    table: jnp.ndarray,
    num_samples: int,
    ratio: float,
    loop: bool,
    windowed: bool = False,
) -> jnp.ndarray:
    """Device: per-sample playback from pconst-evaluated program values.

    windowed=True (caller must have checked windowed_safe on the plan)
    replaces the per-sample gather with the 2-pass windowed lookup — same
    tap values bit-for-bit."""
    dt = (t_idx[None, :] - vals["seg_start"]).astype(jnp.float32)
    mode = vals["mode"]
    ratio_f = jnp.float32(ratio)

    # resample path (Sampler.zig:115-130): t = t0 + i*ratio, 2-tap inverted lerp
    t = vals["t0"] + dt * ratio_f
    it0 = jnp.floor(t).astype(jnp.int32)
    tfrac = (it0 + 1).astype(jnp.float32) - t
    ifast = vals["t0"].astype(jnp.int32) + dt.astype(jnp.int32)

    n = t_idx.shape[0]
    if windowed and n % _WIN_TILE == 0:
        W = windowed_w(ratio)

        def ok_of(index):
            if loop:
                return jnp.ones_like(index, dtype=bool)
            return (index >= 0) & (index < num_samples)

        # one lookup serves both modes' first tap (their indices are
        # program-span disjoint); the second tap only matters in resample
        # mode but is harmless elsewhere
        idx_a = jnp.where(mode == 2, ifast, it0)
        tap_a = _windowed_taps(idx_a, ok_of(idx_a), table, num_samples, W)
        tap_b = _windowed_taps(it0 + 1, ok_of(it0 + 1), table, num_samples, W)
        s_re = tap_a * (jnp.float32(1.0) - tfrac) + tap_b * tfrac
        s_fast = tap_a
    else:
        def tap(index: jnp.ndarray) -> jnp.ndarray:
            if loop:
                index = jnp.remainder(index, num_samples)
            ok = (index >= 0) & (index < num_samples)
            return jnp.where(ok, table[jnp.clip(index, 0, max(num_samples - 1, 0))], 0.0)

        s_re = tap(it0) * (jnp.float32(1.0) - tfrac) + tap(it0 + 1) * tfrac
        # fast copy path (Sampler.zig:105-114)
        s_fast = tap(ifast)
    out = jnp.where(mode == 1, s_re, jnp.where(mode == 2, s_fast, jnp.float32(0.0)))
    return out
