"""Ablation timing for the Bach render: which stage owns the device time.

Renders N seconds with selected stages stubbed out and reports per-variant
steady-state time. Variants:
  full        unmodified pipeline
  nofilter    SVF filters replaced with pass-through
  noenv       envelope program eval replaced with constant 1.0
  noosc       oscillators replaced with the raw phase ramp (no sin / pulse)
  noprog      segment-program eval replaced with constants (keeps osc+filter)

Run on the real chip: python tools/ablate.py [seconds] [chunk]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def patched(variant):
    from zang_tpu.ops import control, filters, oscillators

    orig = {
        "svf": filters.svf_filter,
        "painter": control.eval_painter,
        "sine": oscillators.sine_wave,
        "pulse": oscillators.pulse_wave,
        "eval_chunk": None,
    }

    if variant == "nofilter":
        filters.svf_filter = lambda l, b, x, t, c, r, a=None: (l, b, x)
    elif variant == "noenv":
        control.eval_painter = (
            lambda vals, t_idx: jnp.ones(
                (next(iter(vals.values())).shape[0], t_idx.shape[0]), jnp.float32
            )
        )
    elif variant == "noosc":
        from zang_tpu.ops.scan import utof23

        oscillators.sine_wave = lambda cnt, mod=0.0: utof23(cnt) + mod * 0
        oscillators.pulse_wave = lambda cnt, ifreq, color, valid=None: utof23(cnt)
    return orig


def restore(orig):
    from zang_tpu.ops import control, filters, oscillators

    filters.svf_filter = orig["svf"]
    control.eval_painter = orig["painter"]
    oscillators.sine_wave = orig["sine"]
    oscillators.pulse_wave = orig["pulse"]


def run_variant(variant, seconds, chunk):
    # instruments call filters.svf_filter / control.eval_painter /
    # oscillators.* via module attribute lookup, so patching the module
    # attributes is enough — no reload needed.
    orig = patched(variant)
    try:
        from zang_tpu.graph.render import make_render_fn
        from zang_tpu.host import song as sm

        total = int(seconds * sm.SAMPLE_RATE)
        perf = sm.build_performance(total)
        run, args = make_render_fn(perf, total, chunk_size=chunk)
        jrun = jax.jit(lambda s, st, xs: jnp.sum(run(s, st, xs)).astype(jnp.float32))
        float(jrun(*args))
        times = []
        for _ in range(3):
            t0 = time.time()
            float(jrun(*args))
            times.append(time.time() - t0)
        return min(times)
    finally:
        restore(orig)


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    variants = ["full", "nofilter", "noenv", "noosc"]
    results = {}
    for v in variants:
        dt = run_variant(v, seconds, chunk)
        results[v] = dt
        print(f"{v:10s} {dt*1000:8.1f} ms   rtf {seconds/dt:8.0f}x", flush=True)
    base = results["full"]
    for v in variants[1:]:
        print(f"{v:10s} saves {(base - results[v])*1000:7.1f} ms "
              f"({100*(base-results[v])/base:.0f}%)")


if __name__ == "__main__":
    main()
