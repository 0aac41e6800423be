"""SVF state-variable filter as a parallel affine scan.

The reference's filter (src/modules/Filter.zig:96-151) is a per-sample
2-state recurrence — but a *linear time-varying* one: both oversampling
steps update (l, b) affinely given (cutoff, res, input). So the whole time
axis parallelizes: build the per-sample affine map (A_i, c_i) by probing the
step function on basis states (exactly captures the f32-evaluated
coefficients), compose with an associative scan, and evaluate outputs from
the prefix states. Rounding differs from the sequential loop only through
the scan's association order; the filter is contractive, so deviations stay
at the 1e-6 level (measured in tests) instead of accumulating.
"""

from typing import Optional, Tuple, Union

import jax.numpy as jnp

from .scan import affine_scan_with_prestates

Array = jnp.ndarray

FCDCOFFSET = jnp.float32(3.814697265625e-6)  # 2^-18, Filter.zig:8

FILTER_MULS = {
    "bypass": None,
    "low_pass": (1.0, 0.0, 0.0),
    "band_pass": (0.0, 1.0, 0.0),
    "high_pass": (0.0, 0.0, 1.0),
    "notch": (1.0, 0.0, 1.0),
    "all_pass": (1.0, 1.0, 1.0),
}


def cutoff_from_frequency(frequency, sample_rate):
    """src/modules/Filter.zig:20-23. Works on scalars or arrays (f32)."""
    f32 = jnp.float32
    v = f32(2.0) * (f32(1.0) - jnp.cos(f32(jnp.pi) * frequency / f32(sample_rate)))
    return jnp.sqrt(jnp.clip(v, 0.0, 1.0))


def _svf_step(l, b, inp, cut, res):
    """One output sample: the 2x oversampled update (Filter.zig:123-147).

    Returns (l', b', weighted-output-parts (l_out, b_out, h_out)).
    All ops f32 in the reference's expression order.
    """
    inv = inp + FCDCOFFSET
    l = l + cut * b - FCDCOFFSET
    b = b + cut * (inv - b * res - l)
    l = l + cut * b
    h = inv - b * res - l
    b = b + cut * h
    return l, b, h


def svf_filter(
    l0: Array,
    b0: Array,
    x: Array,
    filter_type: str,
    cutoff: Union[Array, float],
    res: Union[Array, float],
    active: Optional[Array] = None,
) -> Tuple[Array, Array, Array]:
    """Run the SVF over x [..., n]. Returns (l_end, b_end, out [..., n]).

    cutoff/res: raw 0-1 params (clamped like the reference); broadcastable
    to x. active: bool [..., n] — inactive samples leave state untouched and
    output 0 (module not painted).
    """
    if filter_type == "bypass":
        out = x if active is None else jnp.where(active, x, 0.0)
        return l0, b0, out

    l_mul, b_mul, h_mul = FILTER_MULS[filter_type]
    cut = jnp.clip(jnp.asarray(cutoff, jnp.float32), 0.0, 1.0)
    r = jnp.float32(1.0) - jnp.clip(jnp.asarray(res, jnp.float32), 0.0, 1.0)
    cut = jnp.broadcast_to(cut, x.shape)
    r = jnp.broadcast_to(r, x.shape)

    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)

    # probe the affine step on basis states to extract A_i and c_i exactly as
    # f32-evaluated: state' = A s + c, h = Ah s + ch.
    l_00, b_00, h_00 = _svf_step(zero, zero, x, cut, r)  # c, ch
    l_10, b_10, h_10 = _svf_step(one, zero, x, cut, r)
    l_01, b_01, h_01 = _svf_step(zero, one, x, cut, r)

    A = jnp.stack(
        [
            jnp.stack([l_10 - l_00, l_01 - l_00], axis=-1),
            jnp.stack([b_10 - b_00, b_01 - b_00], axis=-1),
        ],
        axis=-2,
    )  # [..., n, 2, 2]
    c = jnp.stack([l_00, b_00], axis=-1)  # [..., n, 2]

    if active is not None:
        eye = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), A.shape)
        A = jnp.where(active[..., None, None], A, eye)
        c = jnp.where(active[..., None], c, 0.0)

    s0 = jnp.stack([l0, b0], axis=-1)  # [..., 2]
    pre, post = affine_scan_with_prestates(A, c, s0)

    # output uses post-step l and b plus h computed from the pre-step state
    l_out = post[..., 0]
    b_out = post[..., 1]
    h_out = h_00 + (h_10 - h_00) * pre[..., 0] + (h_01 - h_00) * pre[..., 1]
    out = (
        l_out * jnp.float32(l_mul)
        + b_out * jnp.float32(b_mul)
        + h_out * jnp.float32(h_mul)
    )
    if active is not None:
        out = jnp.where(active, out, 0.0)
    l_end = post[..., -1, 0]
    b_end = post[..., -1, 1]
    return l_end, b_end, out
