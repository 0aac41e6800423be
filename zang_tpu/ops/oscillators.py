"""Oscillator kernels: sine, pulse, tri/saw, cycle.

All phase accumulation is u32 fixed point (the parity contract; the
reference's PulseOsc/TriSawOsc already work this way — PulseOsc.zig:90-95).
Phase counters are order-independent modular sums, so the whole time axis is
a parallel prefix sum: no sequential loop, no drift, and bit-identical
results under any chunking.

Conventions:
- freq/speed arrive as f32 [..., n] (per-sample; the render layer expands
  note-constant params via segment gather).
- state (phase counter) is u32 [...]; returned alongside the fresh output.
- `active`: bool [..., n]; where False, the module "was never painted"
  (no phase advance, zero output) — this encodes the reference's behavior
  before the first note (Trigger yields nothing until the first impulse).
"""

from typing import Optional, Tuple, Union

import jax.numpy as jnp

from .scan import exclusive_cumsum_u32, freq_to_ifreq, ftou32, utof23

Array = jnp.ndarray
PI = jnp.float32(3.14159265358979323846)
GAIN = jnp.float32(0.7)


def _advance(cnt0: Array, ifreq: Array) -> Tuple[Array, Array]:
    """Per-sample phase counters (exclusive) + end counter."""
    cnt = cnt0[..., None] + exclusive_cumsum_u32(ifreq)
    cnt_end = cnt[..., -1] + ifreq[..., -1]
    return cnt, cnt_end


def sine_osc(
    cnt0: Array,
    freq: Array,
    phase: Union[Array, float],
    sample_rate: float,
    active: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Sine oscillator (parity contract for src/modules/SineOsc.zig:23-87).

    out = sin((t + phase) * pi * 2) with t = utof23(cnt), preserving the
    reference's expression order.
    """
    ifreq = freq_to_ifreq(jnp.asarray(freq, jnp.float32), sample_rate)
    if active is not None:
        ifreq = jnp.where(active, ifreq, jnp.uint32(0))
    cnt, cnt_end = _advance(cnt0, ifreq)
    t = utof23(cnt)
    out = jnp.sin((t + jnp.asarray(phase, jnp.float32)) * PI * jnp.float32(2.0))
    if active is not None:
        out = jnp.where(active, out, jnp.float32(0.0))
    return cnt_end, out


def pulse_osc(
    cnt0: Array,
    freq: Array,
    color: Union[Array, float],
    sample_rate: float,
    active: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Anti-aliased pulse/square (src/modules/PulseOsc.zig:77-157).

    Bit-identical to the reference for segment-constant frequency: the
    3-bit transition state machine reduces to pure functions of consecutive
    phase counters (prev bit = (cnt - ifreq) < brpt, cur bit = cnt < brpt,
    wrap bit = cnt < ifreq). Out-of-range samples (freq < 0 or > sr/8) are
    silent and do not advance phase (PulseOsc.zig:82-84,121-123).
    """
    freq = jnp.asarray(freq, jnp.float32)
    valid = (freq >= 0) & (freq <= jnp.float32(sample_rate) / jnp.float32(8.0))
    if active is not None:
        valid = valid & active
    srbase = jnp.float32(4294967296.0) / jnp.float32(sample_rate)
    ifreq = jnp.where(valid, (srbase * freq).astype(jnp.uint32), jnp.uint32(0))
    cnt, cnt_end = _advance(cnt0, ifreq)

    brpt = ftou32(jnp.clip(jnp.asarray(color, jnp.float32), 0.0, 1.0))
    col = utof23(brpt)
    # gdf only matters on transition samples, where ifreq >= 1; clamp to
    # avoid inf/NaN in unselected lanes.
    gdf = GAIN / utof23(jnp.maximum(ifreq, jnp.uint32(1)))
    cc121 = gdf * jnp.float32(2.0) * (col - jnp.float32(1.0)) + GAIN
    cc212 = gdf * jnp.float32(2.0) * col - GAIN
    p = utof23(cnt)
    prev = (cnt - ifreq) < brpt
    cur = cnt < brpt
    wrapped = cnt < ifreq
    up = GAIN  # 0b011
    down = -GAIN  # 0b000
    updown = gdf * jnp.float32(2.0) * (col - p) + GAIN  # 0b010
    downup = gdf * jnp.float32(2.0) * p - GAIN  # 0b101
    v_nowrap = jnp.where(prev, jnp.where(cur, up, updown), down)
    v_wrap = jnp.where(prev, cc121, jnp.where(cur, downup, cc212))
    out = jnp.where(valid, jnp.where(wrapped, v_wrap, v_nowrap), jnp.float32(0.0))
    return cnt_end, out


def trisaw_osc(
    cnt0: Array,
    freq: Array,
    color: Union[Array, float],
    sample_rate: float,
    active: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Anti-aliased tri/saw morph (src/modules/TriSawOsc.zig:77-118).

    Integrated-polynomial form; bit-identical to the reference's
    constant-frequency path. (For controlled frequency the reference falls
    back to a naive non-antialiased wave with a TODO — TriSawOsc.zig:127-131;
    use trisaw_naive for that parity, or this for strictly better quality.)
    """
    freq = jnp.asarray(freq, jnp.float32)
    valid = (freq >= 0) & (freq <= jnp.float32(sample_rate) / jnp.float32(8.0))
    if active is not None:
        valid = valid & active
    srbase = jnp.float32(4294967296.0) / jnp.float32(sample_rate)
    ifreq = jnp.where(valid, (srbase * freq).astype(jnp.uint32), jnp.uint32(0))
    cnt, cnt_end = _advance(cnt0, ifreq)

    brpt = ftou32(jnp.clip(jnp.asarray(color, jnp.float32), 0.0, 1.0))
    col = utof23(brpt)
    ifreq_safe = jnp.maximum(ifreq, jnp.uint32(1))
    f = utof23(ifreq_safe)
    omf = jnp.float32(1.0) - f
    rcpf = jnp.float32(1.0) / f
    c1 = GAIN / col
    c2 = -GAIN / (jnp.float32(1.0) - col)
    p = utof23(cnt) - col
    prev = (cnt - ifreq) < brpt
    cur = cnt < brpt
    wrapped = cnt < ifreq
    up = c1 * (p + p - f)
    down = c2 * (p + p - f)
    updown = rcpf * (c2 * (p * p) - c1 * ((p - f) * (p - f)))
    downup = -rcpf * (GAIN + c2 * ((p + omf) * (p + omf)) - c1 * (p * p))
    ududu = -rcpf * (GAIN + c1 * omf * (p + p + omf))
    dudud = -rcpf * (GAIN + c2 * omf * (p + p + omf))
    v_nowrap = jnp.where(prev, jnp.where(cur, up, updown), down)
    v_wrap = jnp.where(prev, ududu, jnp.where(cur, downup, dudud))
    out = jnp.where(valid, GAIN + jnp.where(wrapped, v_wrap, v_nowrap), jnp.float32(0.0))
    return cnt_end, out


def trisaw_naive(
    cnt0: Array,
    freq: Array,
    color: Union[Array, float],
    sample_rate: float,
    active: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Naive tri/saw on a u32 phase — parity twin of the reference's
    controlled-frequency fallback (TriSawOsc.zig:120-156)."""
    ifreq = freq_to_ifreq(jnp.asarray(freq, jnp.float32), sample_rate)
    if active is not None:
        ifreq = jnp.where(active, ifreq, jnp.uint32(0))
    cnt, cnt_end = _advance(cnt0, ifreq)
    t = utof23(cnt)
    color_f = jnp.asarray(color, jnp.float32)
    saw = t * jnp.float32(2.0) - jnp.float32(1.0)
    tri = jnp.where(
        t < 0.25,
        t * jnp.float32(4.0),
        jnp.where(
            t < 0.75,
            jnp.float32(1.0) - (t - jnp.float32(0.25)) * jnp.float32(4.0),
            (t - jnp.float32(0.75)) * jnp.float32(4.0) - jnp.float32(1.0),
        ),
    )
    frac = jnp.where((color_f < 0.25) | (color_f > 0.75), saw, tri)
    out = GAIN * frac
    if active is not None:
        out = jnp.where(active, out, jnp.float32(0.0))
    return cnt_end, out


def cycle(
    cnt0: Array,
    speed: Array,
    sample_rate: float,
    active: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Phasor 0->~1 wrapping (src/modules/Cycle.zig), u32 parity form."""
    ifreq = freq_to_ifreq(jnp.asarray(speed, jnp.float32), sample_rate)
    if active is not None:
        ifreq = jnp.where(active, ifreq, jnp.uint32(0))
    cnt, cnt_end = _advance(cnt0, ifreq)
    out = utof23(cnt)
    if active is not None:
        out = jnp.where(active, out, jnp.float32(0.0))
    return cnt_end, out
