"""Parallel scan utilities: the TPU replacement for per-sample loops.

The reference carries tiny state across per-sample loops (oscillator phases,
filter l/b, envelope timers — SURVEY.md §2b). Here those recurrences become:

- u32 prefix sums (exact under any association order: modular arithmetic),
- affine scans: x_{i+1} = A_i x_i + c_i composed associatively,
  ((A2,c2)∘(A1,c1) = (A2 A1, A2 c1 + c2)).
"""

import jax
import jax.numpy as jnp


def exclusive_cumsum_u32(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Exclusive prefix sum in uint32 (wrapping, order-independent)."""
    inc = jnp.cumsum(x, axis=axis, dtype=jnp.uint32)
    return inc - x  # wrap-safe: inclusive minus element = exclusive


def utof23(cnt: jnp.ndarray) -> jnp.ndarray:
    """u32 phase -> float in [0,1) with 23-bit precision.

    The reference's bit trick (PulseOsc.zig:19-21): stuff the top 23 bits
    into a float mantissa with exponent 0 and subtract 1.
    """
    bits = (cnt >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    return jax.lax.bitcast_convert_type(bits, jnp.float32) - jnp.float32(1.0)


def ftou32(v: jnp.ndarray) -> jnp.ndarray:
    """float [0,1) -> 0.32 unsigned fixed point (PulseOsc.zig:23-25)."""
    return ((v * jnp.float32(4294967296.0)) * jnp.float32(0.99995)).astype(jnp.uint32)


def freq_to_ifreq(freq: jnp.ndarray, sample_rate: float) -> jnp.ndarray:
    """Frequency (Hz, f32, may be negative) -> u32 phase increment.

    ifreq = u32(f32(2^32 / sr) * freq); negatives map to two's complement
    (backward phase motion), matching the oracle's (u32)(i64) conversion.
    """
    srbase = jnp.float32(4294967296.0) / jnp.float32(sample_rate)
    scaled = srbase * freq
    mag = jnp.abs(scaled).astype(jnp.uint32)
    return jnp.where(scaled >= 0, mag, jnp.uint32(0) - mag)


def affine_scan(A: jnp.ndarray, c: jnp.ndarray, s0: jnp.ndarray, time_axis: int = -3):
    """Run x_i = A_i x_{i-1} + c_i in parallel; returns all post-states.

    A: [..., n, d, d], c: [..., n, d], s0: [..., d].
    Returns states [..., n, d] where states[..., i, :] is the state AFTER
    applying step i (inclusive scan).

    The 2x2 composition is written as explicit elementwise arithmetic: on
    TPU, einsum/matmul would route f32 through bf16 MXU passes at default
    precision, which destroys the filter's precision (~-50 dB). Elementwise
    mul/add stays on the VPU in full f32.
    """
    assert time_axis == -3
    d = A.shape[-1]
    assert d == 2, "specialized for 2-state recurrences"

    def combine(x, y):
        (a1, b1, c1_, d1, e1, f1) = x
        (a2, b2, c2_, d2, e2, f2) = y
        # M2 @ M1 for M = [[a, b], [c, d]]; offset v2 + M2 @ v1 for v = [e, f]
        return (
            a2 * a1 + b2 * c1_,
            a2 * b1 + b2 * d1,
            c2_ * a1 + d2 * c1_,
            c2_ * b1 + d2 * d1,
            a2 * e1 + b2 * f1 + e2,
            c2_ * e1 + d2 * f1 + f2,
        )

    elems = (
        A[..., 0, 0], A[..., 0, 1], A[..., 1, 0], A[..., 1, 1],
        c[..., 0], c[..., 1],
    )
    a, b, c_, dd, e, f = jax.lax.associative_scan(combine, elems, axis=A.ndim - 3)
    x0 = s0[..., None, 0]
    y0 = s0[..., None, 1]
    states = jnp.stack([a * x0 + b * y0 + e, c_ * x0 + dd * y0 + f], axis=-1)
    return states


def affine_scan_with_prestates(A, c, s0):
    """Like affine_scan but also returns pre-states (state BEFORE step i)."""
    post = affine_scan(A, c, s0)
    pre = jnp.concatenate(
        [jnp.broadcast_to(s0[..., None, :], (*post.shape[:-2], 1, post.shape[-1])),
         post[..., :-1, :]],
        axis=-2,
    )
    return pre, post
