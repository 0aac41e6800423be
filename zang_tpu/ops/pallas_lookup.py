"""Pallas TPU kernel for sample-table lookups (the sampler's taps).

XLA's elementwise gather is pathologically slow on TPU and a compile bomb.
This kernel keeps the whole decoded sample table resident in VMEM as a
[128, H] matrix (H = ceil(num_samples / 128) columns of 128 consecutive
samples... transposed: table2dT[l, h] = table[h * 128 + l]) and looks up
each sample with two exact selections:

  idx = hi * 128 + lo
  P[l, i]  = sum_h table2dT[l, h] * [hi_i == h]     (MXU matmul, one
             nonzero f32 term per column -> exact)
  out[i]   = sum_l P[l, i] * [lo_i == l] * sel_i    (VPU sublane reduce)

Everything stays in the TPU's natural layout: per 512-sample tile the
one-hots are built with sample index on lanes (broadcasted_iota on the
sublane axis), the matmul contracts lhs lanes against rhs sublanes, and
the final reduce runs over sublanes. No relayouts, no dynamic lane
slicing, no [*, W] one-hot through HBM.

Works for arbitrary index patterns (no locality assumptions), so the
sampler needs no cluster guard — loop wraps, reverse playback, and dense
retriggers all hit the same path. Tables up to 128 * 2048 samples
(~6 s at 44.1 kHz) fit the VMEM budget; larger tables fall back to the
gather path in ops/sampler.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512
GROUP = 8  # tiles per grid step
LANE = 128
MAX_H = 2048  # max table columns (VMEM budget for the [Hp, TILE] one-hot)


def _lookup_kernel(hi_ref, lo_ref, sel_ref, tab_ref, out_ref):
    Hp = tab_ref.shape[-1]

    for k in range(GROUP):  # static unroll over the block's tiles
        hi = hi_ref[k]  # [TILE] i32 on lanes
        lo = lo_ref[k]
        sel = sel_ref[k]  # [TILE] f32 0/1
        ar_h = jax.lax.broadcasted_iota(jnp.int32, (Hp, TILE), 0)
        oh_hi = jnp.where(ar_h == hi[None, :], np.float32(1.0),
                          np.float32(0.0))
        # [LANE, Hp] @ [Hp, TILE] -> [LANE, TILE]: column i holds the 128
        # candidate samples of idx_i's row group
        p = jax.lax.dot_general(
            tab_ref[...], oh_hi, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        ar_l = jax.lax.broadcasted_iota(jnp.int32, (LANE, TILE), 0)
        picked = jnp.where(ar_l == lo[None, :], p, np.float32(0.0))
        out_ref[k] = jnp.sum(picked, axis=0) * sel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _lookup_call(hi, lo, sel, tabT, interpret=False):
    nt = hi.shape[0]
    Hp = tabT.shape[-1]
    row = pl.BlockSpec((GROUP, TILE), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    tab = pl.BlockSpec((LANE, Hp), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _lookup_kernel,
        grid=(nt // GROUP,),
        in_specs=[row, row, row, tab],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((nt, TILE), jnp.float32),
        interpret=interpret,
    )(hi, lo, sel, tabT)


def pack_table(table: jnp.ndarray) -> jnp.ndarray:
    """[num_samples] f32 -> [128, Hp] with tabT[l, h] = table[h*128 + l],
    zero-padded; Hp rounded up to a lane multiple for the matmul."""
    n = table.shape[0]
    H = -(-n // LANE)
    Hp = -(-H // LANE) * LANE
    padded = jnp.concatenate(
        [table, jnp.zeros((Hp * LANE - n,), table.dtype)])
    return padded.reshape(Hp, LANE).T


def table_lookup_pallas(idx, sel, tabT, interpret=False):
    """idx: [nt, TILE] i32 in [0, num_samples); sel: [nt, TILE] f32 0/1;
    tabT: pack_table output. Returns [nt, TILE] f32 with
    out = sel * table[idx] (exact)."""
    nt, t = idx.shape
    assert t == TILE, (nt, t)
    hi = (idx >> 7).astype(jnp.int32)
    lo = (idx & (LANE - 1)).astype(jnp.int32)
    ntp = -(-nt // GROUP) * GROUP
    if ntp != nt:
        def pad(a):
            return jnp.concatenate(
                [a, jnp.zeros((ntp - nt,) + a.shape[1:], a.dtype)], axis=0)
        hi, lo, sel = pad(hi), pad(lo), pad(sel)
    out = _lookup_call(hi, lo, sel, tabT, interpret=interpret)
    return out[:nt]
