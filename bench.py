"""Headline benchmarks on one chip, driver-readable.

Prints one JSON line per metric, each of the form
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
The headline metric (full Bach Toccata render realtime factor) is printed
LAST. Metrics, in print order:

  sampler_chain_rtf_44k        drumloop sampler -> distortion -> decimator
                               chain RTF (BASELINE.md "sampler" config);
                               vs_baseline = value / 1000
  poly_echo_voices_per_chip    concurrent NiceInstrument voices through
                               StereoEchoes sustainable at RTF=1 on one chip
                               (measured at 16384 voices, scaled by RTF);
                               vs_baseline = value / 1024
  bach_render_fidelity_rms_dbfs  full-render deviation vs the parity oracle
                               (budget < -90); vs_baseline = value / -90
                               (>1 means within budget)
  bach_toccata_render_rtf_48k  full 385 s song render RTF;
                               vs_baseline = value / 1000

value = steady-state realtime factor (render seconds of audio per wall
second, compile excluded — jitted once, then timed best-of-3 with a scalar
fetch; jax.block_until_ready returns before remote execution completes).

Env:
  ZANG_BENCH_SECONDS   song render length (default 385, the write_wav
                       golden duration); also the fidelity compare length
  ZANG_BENCH_CHUNK     chunk size (default 65536)
  ZANG_BENCH_METRICS   comma list to subset: sampler,poly,fidelity,song
  ZANG_BENCH_POLY_VOICES / ZANG_BENCH_POLY_SECONDS  capacity config
                       (default 16384 voices, 8 s)
  ZANG_BENCH_SAMPLER_SECONDS  sampler config length (default 60 s)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _timed(jrun, args):
    t0 = time.time()
    float(jrun(*args))  # scalar fetch forces full remote execution
    return time.time() - t0


def _first_run(jrun, args):
    """Compile + first execution, retrying the one known-transient axon
    error (FAILED_PRECONDITION on fresh processes). Anything else raises."""
    for attempt in range(3):
        try:
            return float(jrun(*args))
        except Exception as e:  # noqa: BLE001 — filtered by message below
            if attempt == 2 or "FAILED_PRECONDITION" not in repr(e):
                raise
            time.sleep(5)


def emit(metric, value, unit, vs_baseline):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": value,
                "unit": unit,
                "vs_baseline": vs_baseline,
            }
        ),
        flush=True,
    )


def _steady_rtf(run, args, seconds):
    import jax
    import jax.numpy as jnp

    jrun = jax.jit(lambda *a: jnp.sum(run(*a)).astype(jnp.float32))
    _first_run(jrun, args)
    dt = min(_timed(jrun, args) for _ in range(3))  # best-of-3: remote jitter
    return seconds / dt


def bench_sampler(chunk):
    from zang_tpu.graph.render import make_render_fn
    from zang_tpu.host.configs import build_sampler_performance

    seconds = float(os.environ.get("ZANG_BENCH_SAMPLER_SECONDS", 60.0))
    perf, total = build_sampler_performance(seconds=seconds)
    run, args = make_render_fn(perf, total, chunk_size=min(chunk, total))
    rtf = _steady_rtf(run, args, seconds)
    emit("sampler_chain_rtf_44k", round(rtf, 1), "x_realtime", round(rtf / 1000.0, 3))


def bench_poly(chunk):
    from zang_tpu.graph.render import make_render_fn
    from zang_tpu.host.configs import build_poly_echo_performance

    voices = int(os.environ.get("ZANG_BENCH_POLY_VOICES", 16384))
    seconds = float(os.environ.get("ZANG_BENCH_POLY_SECONDS", 8.0))
    chunk = int(os.environ.get("ZANG_BENCH_POLY_CHUNK", chunk))
    perf, total = build_poly_echo_performance(num_voices=voices, seconds=seconds)
    run, args = make_render_fn(perf, total, chunk_size=min(chunk, total))
    rtf = _steady_rtf(run, args, seconds)
    capacity = int(voices * rtf)
    emit(
        "poly_echo_voices_per_chip",
        capacity,
        "voices_at_rtf1",
        round(capacity / 1024.0, 2),
    )


def bench_fidelity(seconds, chunk):
    import numpy as np

    from zang_tpu.graph.fidelity import deviation_dbfs
    from zang_tpu.graph.render import render_performance
    from zang_tpu.host import song as sm

    total = int(seconds * sm.SAMPLE_RATE)
    perf = sm.build_performance(total)
    dev = render_performance(perf, total, chunk_size=min(chunk, total))
    ref = sm.render_song_oracle(seconds)
    rms, _peak = deviation_dbfs(np.asarray(dev)[0], ref)
    emit(
        "bach_render_fidelity_rms_dbfs",
        round(float(rms), 1),
        "dbfs_rms_vs_oracle",
        round(float(rms) / -90.0, 3),
    )


def bench_song(seconds, chunk):
    from zang_tpu.graph.render import make_render_fn
    from zang_tpu.host import song as sm

    total = int(seconds * sm.SAMPLE_RATE)
    perf = sm.build_performance(total)
    run, args = make_render_fn(perf, total, chunk_size=min(chunk, total))
    rtf = _steady_rtf(run, args, seconds)
    emit(
        "bach_toccata_render_rtf_48k",
        round(rtf, 1),
        "x_realtime",
        round(rtf / 1000.0, 3),
    )


def main():
    from zang_tpu.host import song as sm

    seconds = float(os.environ.get("ZANG_BENCH_SECONDS", sm.NUM_SECONDS))
    chunk = int(os.environ.get("ZANG_BENCH_CHUNK", 65536))
    which = os.environ.get("ZANG_BENCH_METRICS", "sampler,poly,fidelity,song")
    which = {w.strip() for w in which.split(",") if w.strip()}

    if "sampler" in which:
        bench_sampler(chunk)
    if "poly" in which:
        bench_poly(chunk)
    if "fidelity" in which:
        bench_fidelity(seconds, chunk)
    if "song" in which:  # headline — keep last so it's the final JSON line
        bench_song(seconds, chunk)


if __name__ == "__main__":
    main()
