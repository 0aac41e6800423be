"""Profiling for the render pipeline — replaces the removed stub-ablation
tool (tools/ablate.py), whose stub substitution broke XLA fusion and
mis-attributed device time (round-1 journal). Three trustworthy methods:

  python tools/profile.py [seconds] [chunk]            timing + cost analysis
  python tools/profile.py --trace DIR [seconds]        jax.profiler trace
  python tools/profile.py --variants [seconds] [chunk] env-knob comparison

- Cost analysis: XLA's own per-executable flops/bytes estimate
  (compiled.cost_analysis()) — attribution by the compiler, not by stubbing.
- Trace: a real profiler capture (view with TensorBoard / xprof).
- Variants: each knob selects a REAL alternative code path (the affine-scan
  SVF vs the Pallas kernel, table-cut vs dense cutoff), so deltas compare
  shippable configurations instead of fusion-broken stubs.

Timing always fetches a scalar: on the remote TPU backend
jax.block_until_ready returns before execution completes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "full": {},
    "scan-svf": {"ZANG_PALLAS_SVF": "0"},       # affine-scan filter path
    "dense-cut": {"ZANG_SVF_TABLE": "0"},        # dense [V,n] cutoff arrays
    "no-pallas-lookup": {"ZANG_PALLAS_LOOKUP": "0"},
}


def build(seconds, chunk):
    import jax
    import jax.numpy as jnp

    from zang_tpu.graph.render import make_render_fn
    from zang_tpu.host import song as sm

    total = int(seconds * sm.SAMPLE_RATE)
    perf = sm.build_performance(total)
    run, args = make_render_fn(perf, total, chunk_size=min(chunk, total))
    jrun = jax.jit(lambda s, st, xs: jnp.sum(run(s, st, xs)).astype(jnp.float32))
    return jrun, args


def steady_time(jrun, args, reps=3):
    float(jrun(*args))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.time()
        float(jrun(*args))
        times.append(time.time() - t0)
    return min(times)


def report_cost(jrun, args):
    lowered = jrun.lower(*args)
    cost = lowered.compile().cost_analysis()
    if not cost:
        print("cost analysis unavailable on this backend")
        return
    flops = cost.get("flops", 0.0)
    bytes_moved = cost.get("bytes accessed", 0.0)
    print(f"XLA cost analysis: {flops/1e9:.2f} GFLOP, "
          f"{bytes_moved/1e9:.3f} GB accessed"
          + (f", arithmetic intensity {flops/max(bytes_moved,1):.1f} flop/B"
             if bytes_moved else ""))
    for k in ("transcendentals", "optimal_seconds"):
        if cost.get(k):
            print(f"  {k}: {cost[k]:.3g}")


def main():
    argv = sys.argv[1:]
    trace_dir = None
    variants = False
    if argv and argv[0] == "--trace":
        trace_dir = argv[1]
        argv = argv[2:]
    elif argv and argv[0] == "--variants":
        variants = True
        argv = argv[1:]
    seconds = float(argv[0]) if argv else 60.0
    chunk = int(argv[1]) if len(argv) > 1 else 65536

    if variants:
        # fresh process per variant: the knobs are read at trace time and
        # jit caches must not leak between configurations
        import json
        import subprocess

        for name, env in VARIANTS.items():
            # load this file under a non-clashing module name (plain
            # `import profile` would collide with the stdlib module)
            code = (
                "import importlib.util; "
                "spec = importlib.util.spec_from_file_location('zang_profile', %r); "
                "m = importlib.util.module_from_spec(spec); "
                "spec.loader.exec_module(m); "
                "jrun, args = m.build(%r, %r); dt = m.steady_time(jrun, args); "
                "print('RESULT', dt)"
            ) % (os.path.abspath(__file__), seconds, chunk)
            full_env = dict(os.environ, **env)
            out = subprocess.run([sys.executable, "-c", code], env=full_env,
                                 capture_output=True, text=True)
            line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
            if line:
                dt = float(line[0].split()[1])
                print(f"{name:18s} {dt*1000:8.1f} ms   rtf {seconds/dt:8.0f}x "
                      f"env={json.dumps(env)}", flush=True)
            else:
                print(f"{name:18s} FAILED:\n{out.stderr[-500:]}", flush=True)
        return

    jrun, args = build(seconds, chunk)
    if trace_dir:
        import jax

        float(jrun(*args))  # compile outside the trace
        with jax.profiler.trace(trace_dir):
            float(jrun(*args))
        print(f"trace written to {trace_dir} (view with tensorboard/xprof)")
        return

    dt = steady_time(jrun, args)
    print(f"steady-state: {dt*1000:.1f} ms for {seconds:.0f}s audio "
          f"= {seconds/dt:.0f}x realtime")
    report_cost(jrun, args)


if __name__ == "__main__":
    main()
