"""Distortion and Decimator kernels.

Distortion (src/modules/Distortion.zig): stateless waveshaper; preserved
expression order (gain1 = 2^(ingain*8-2), overdrive = outgain/atan(gain1)
* atan(x*gain1 + gain1*offset), clip = outgain * clamp(x*gain1 + offs)).

Decimator (src/modules/Decimator.zig): sample-and-hold at a fake sample
rate. Parity contract: the fractional accumulator is a u32 counter (trigger
= counter wrap), and the hold is a latch recurrence v_i = trig ? x_i :
v_{i-1} — a first-order affine scan, no gathers.
"""

from typing import Optional, Tuple, Union

import jax.numpy as jnp

from .scan import affine1_scan, exclusive_cumsum_u32

Array = jnp.ndarray


def distortion(
    x: Array,
    kind: str,
    ingain: Union[Array, float],
    outgain: Union[Array, float],
    offset: Union[Array, float],
) -> Array:
    """kind: 'overdrive' | 'clip'."""
    ingain = jnp.asarray(ingain, jnp.float32)
    outgain = jnp.asarray(outgain, jnp.float32)
    offset = jnp.asarray(offset, jnp.float32)
    gain1 = jnp.exp2(ingain * jnp.float32(8.0) - jnp.float32(2.0))
    offs = gain1 * offset
    if kind == "overdrive":
        gain2 = outgain / jnp.arctan(gain1)
        return gain2 * jnp.arctan(x * gain1 + offs)
    elif kind == "clip":
        a = x * gain1 + offs
        return outgain * jnp.clip(a, -1.0, 1.0)
    raise ValueError(kind)


def decimator(
    cnt0: Array,
    dval0: Array,
    x: Array,
    fake_sample_rate: Union[Array, float],
    sample_rate: float,
    active: Optional[Array] = None,
    ratio: Optional[Array] = None,
) -> Tuple[Array, Array, Array]:
    """Sample-and-hold rate reduction over x [..., n].

    cnt0: u32 accumulator state [...] (init 0xFFFFFFFF so the first sample
    triggers, matching dcount=1.0 — Decimator.zig:17); dval0: held value.
    fake >= sr passes through and resets state; fake <= 0 holds forever.
    active: samples where the module is painted — elsewhere the counter
    freezes and the output is zero (the reference host never calls paint
    outside note spans, so an always-running counter would latch on a
    different grid; caught by the differential script fuzz).
    ratio: optional precomputed f32 fake/sr. XLA's f32 division is NOT
    correctly rounded (reciprocal-based, 1 ulp off for e.g. 1858/44100),
    which shifts the u32 latch grid off the oracle's — callers with
    plan-time-known fake must divide on the HOST. A python-float fake is
    divided host-side here automatically; only a traced fake without a
    ratio falls back to device division.
    Returns (cnt_end, dval_end, out).
    """
    import numpy as np

    fake = jnp.asarray(fake_sample_rate, jnp.float32)
    sr = jnp.float32(sample_rate)
    if ratio is None:
        # numbers.Real also catches np.float32/np.float64 scalars — a
        # host-known fake of any scalar type must take the correctly
        # rounded host division, never the device fallback
        import numbers

        if isinstance(fake_sample_rate, numbers.Real):
            ratio = jnp.float32(
                np.float32(np.float32(fake_sample_rate)
                           / np.float32(sample_rate)))
        else:
            ratio = fake / sr
    ratio = jnp.asarray(ratio, jnp.float32)
    # *2^32 is a pure exponent shift (exact); the only rounding is in the
    # division above
    icount = (ratio * jnp.float32(4294967296.0)).astype(jnp.uint32)
    icount_b = jnp.broadcast_to(icount, x.shape)
    if active is not None:
        icount_b = jnp.where(active, icount_b, jnp.uint32(0))
    cnt = cnt0[..., None] + exclusive_cumsum_u32(icount_b) + icount_b
    trig = cnt < icount_b  # u32 wrap happened on this sample
    # latch: v_i = trig ? x_i : v_{i-1}
    a = jnp.where(trig, jnp.float32(0.0), jnp.float32(1.0))
    u = jnp.where(trig, x, jnp.float32(0.0))
    held = affine1_scan(a, u, dval0)

    passthrough = fake >= sr
    silent = fake <= jnp.float32(0.0)  # neither branch taken: untouched
    out = jnp.where(passthrough, x, jnp.where(silent, jnp.float32(0.0), held))
    if active is not None:
        out = jnp.where(active, out, jnp.float32(0.0))
    # fake may be per-sample (the DSL resolves even constant params to
    # per-sample tables); the carry takes the regime at the chunk's last
    # sample. (A fake crossing sr strictly inside one chunk would reset
    # state mid-chunk in the reference; fake is segment-constant in
    # practice, so the regimes align with chunk boundaries or the latch.)
    pt_end = jnp.broadcast_to(passthrough, x.shape)[..., -1]
    sil_end = jnp.broadcast_to(silent, x.shape)[..., -1]
    cnt_end = jnp.where(
        pt_end, jnp.uint32(0xFFFFFFFF), jnp.where(sil_end, cnt0, cnt[..., -1])
    )
    dval_end = jnp.where(
        pt_end, jnp.float32(0.0), jnp.where(sil_end, dval0, held[..., -1])
    )
    return cnt_end, dval_end, out
