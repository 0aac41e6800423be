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
  batch_serve_rtf_aggregate    tier-3 serving: N Bach-slice WAV jobs through
                               BatchRenderer (shared compile, i16 mixdown,
                               streamed WAVs to disk), aggregate audio
                               seconds per wall second on one chip;
                               vs_baseline = value (baseline: 1x realtime
                               delivery — the reference has no serving tier)
  live_fleet_sessions_per_chip tier-4 serving: 64 concurrent live sessions
                               vmapped into one device step; value =
                               lanes * block_budget / block_time (realtime-
                               session equivalents); vs_baseline = value
                               (baseline: the reference's single SDL host =
                               1 interactive session per machine)
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
  ZANG_BENCH_METRICS   comma list to subset:
                       sampler,poly,serve,fleet,fidelity,song
  ZANG_BENCH_POLY_VOICES / ZANG_BENCH_POLY_SECONDS  capacity config
                       (default 16384 voices, 8 s)
  ZANG_BENCH_SAMPLER_SECONDS  sampler config length (default 60 s)
  ZANG_BENCH_SERVE_SONGS / ZANG_BENCH_SERVE_SECONDS  tier-3 config
                       (default 6 jobs x 60 s; short jobs are host-prep
                       bound at ~0.3 s/job)
  ZANG_BENCH_FLEET_LANES / ZANG_BENCH_FLEET_BLOCK  tier-4 config
                       (default 64 lanes x 4096-sample blocks)
  ZANG_BENCH_PROBE_SECONDS / ZANG_BENCH_PROBE_TIMEOUT  preflight device
                       probe: total retry budget (default 1800) and
                       per-attempt subprocess timeout (default 180) —
                       a dead tunnel exits 1 instead of hanging forever
  ZANG_BENCH_IDLE_WAIT / ZANG_BENCH_IDLE_LOAD  serve/fleet idle gate:
                       max seconds to wait for host load1 to drop under
                       IDLE_LOAD * ncpu (defaults 600 s, 0.35) before the
                       contention-sensitive metrics; 0 disables the wait
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


# transient axon tunnel errors worth retrying: FAILED_PRECONDITION shows
# up sporadically on fresh processes; UNAVAILABLE ("TPU backend
# setup/compile error") during tunnel flaps (observed as a multi-hour
# outage on 2026-08-18 — retries ride out the flapping edges of one)
_TRANSIENT = ("FAILED_PRECONDITION", "UNAVAILABLE")


def _probe_device():
    """Fail cleanly (instead of hanging forever) when the TPU tunnel is down.

    The axon outage mode observed on 2026-08-18 HANGS jax.devices()
    rather than erroring, so in-process retries never fire and the whole
    bench run blocks indefinitely. Probe device init in a subprocess with
    a hard timeout, retrying with backoff up to ZANG_BENCH_PROBE_SECONDS
    (default 1800 s) of total budget; exit(1) with a diagnostic if the
    tunnel never comes back. A healthy tunnel passes the probe in one
    attempt (~10-30 s of device init)."""
    import subprocess

    budget = float(os.environ.get("ZANG_BENCH_PROBE_SECONDS", 1800.0))
    per_try = float(os.environ.get("ZANG_BENCH_PROBE_TIMEOUT", 180.0))
    deadline = time.time() + budget
    attempt = 0
    while True:
        attempt += 1
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=per_try, check=True, capture_output=True)
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
            detail = ("hung past %.0f s" % per_try
                      if isinstance(e, subprocess.TimeoutExpired)
                      else (e.stderr or b"").decode(errors="replace")[-400:])
            sys.stderr.write(
                "bench: device probe attempt %d failed (%s)\n"
                % (attempt, detail))
            sys.stderr.flush()
            if time.time() >= deadline:
                sys.stderr.write(
                    "bench: TPU backend unavailable after %.0f s of probing "
                    "— giving up (the axon tunnel is down; rerun when it is "
                    "back)\n" % budget)
                sys.exit(1)
            time.sleep(min(60.0, 10.0 * attempt))


def _first_run(jrun, args, attempts=4):
    """Compile + first execution, retrying known-transient axon errors
    with backoff. Anything else raises."""
    for attempt in range(attempts):
        try:
            return float(jrun(*args))
        except Exception as e:  # noqa: BLE001 — filtered by message below
            if (attempt == attempts - 1
                    or not any(t in repr(e) for t in _TRANSIENT)):
                raise
            time.sleep(5 * (attempt + 1))


_ANCHORS = None


def _anchor_note(metric, value):
    """Compare against the last verified uncontended capture
    (BENCH_ANCHORS.json) so a dip is self-diagnosing: within ~10% of the
    anchor is noise; outside it, check the preflight lines for host/tunnel
    contention before calling it a regression."""
    global _ANCHORS
    if _ANCHORS is None:
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "BENCH_ANCHORS.json")) as f:
                _ANCHORS = json.load(f)
        except (OSError, ValueError):
            _ANCHORS = {}
    a = _ANCHORS.get(metric)
    if not isinstance(a, dict) or not a.get("value"):
        return
    delta = (value - a["value"]) / abs(a["value"])
    flag = ("" if abs(delta) <= 0.10 else
            " OUTSIDE 10%: contention (see preflight) or a real regression")
    print(f"# {metric}: anchor {a['value']} ({a.get('when', '?')}) "
          f"delta {delta:+.0%}{flag}", file=sys.stderr)


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
    _anchor_note(metric, value)


def _spread_note(label, walls):
    spread = (max(walls) - min(walls)) / min(walls) if min(walls) else 0.0
    print(f"# {label} walls={['%.2f' % w for w in walls]} "
          f"spread={spread:.0%}", file=sys.stderr)


def _steady_rtf(run, args, seconds, label=""):
    import jax
    import jax.numpy as jnp

    jrun = jax.jit(lambda *a: jnp.sum(run(*a)).astype(jnp.float32))
    _first_run(jrun, args)
    dts = [_timed(jrun, args) for _ in range(3)]  # best-of-3: remote jitter
    if label:
        _spread_note(label, dts)
    return seconds / min(dts)


def bench_sampler(chunk):
    from zang_tpu.graph.render import make_render_fn
    from zang_tpu.host.configs import build_sampler_performance

    seconds = float(os.environ.get("ZANG_BENCH_SAMPLER_SECONDS", 60.0))
    perf, total = build_sampler_performance(seconds=seconds)
    run, args = make_render_fn(perf, total, chunk_size=min(chunk, total))
    rtf = _steady_rtf(run, args, seconds, label="bench_sampler")
    emit("sampler_chain_rtf_44k", round(rtf, 1), "x_realtime", round(rtf / 1000.0, 3))


def bench_poly(chunk):
    from zang_tpu.graph.render import make_render_fn
    from zang_tpu.host.configs import build_poly_echo_performance

    voices = int(os.environ.get("ZANG_BENCH_POLY_VOICES", 16384))
    seconds = float(os.environ.get("ZANG_BENCH_POLY_SECONDS", 8.0))
    chunk = int(os.environ.get("ZANG_BENCH_POLY_CHUNK", chunk))
    perf, total = build_poly_echo_performance(num_voices=voices, seconds=seconds)
    run, args = make_render_fn(perf, total, chunk_size=min(chunk, total))
    rtf = _steady_rtf(run, args, seconds, label="bench_poly")
    capacity = int(voices * rtf)
    emit(
        "poly_echo_voices_per_chip",
        capacity,
        "voices_at_rtf1",
        round(capacity / 1024.0, 2),
    )


def bench_serve(chunk):
    """Tier-3 aggregate WAV throughput: compile is warmed by one short job,
    then N jobs are timed end-to-end (host prep, render, i16 mixdown,
    download, disk) through the shared-graph BatchRenderer."""
    import tempfile

    from zang_tpu.host import song as sm
    from zang_tpu.serve.batch import BatchRenderer, RenderJob

    songs = int(os.environ.get("ZANG_BENCH_SERVE_SONGS", 6))
    seconds = float(os.environ.get("ZANG_BENCH_SERVE_SECONDS", 60.0))

    def mk(secs):
        total = int(secs * sm.SAMPLE_RATE)
        return lambda: (sm.build_performance(total), total)

    with tempfile.TemporaryDirectory() as out:
        br = BatchRenderer(out_dir=out, chunk_size=chunk)
        warm = br.run([RenderJob(name="warm", build=mk(8.0), volume=0.25)])
        assert warm[0].status == "ok", warm[0].error
        jobs = [
            RenderJob(name=f"job_{i:02d}", build=mk(seconds), volume=0.25)
            for i in range(songs)
        ]
        # best-of-N like the song/fleet metrics: one pass mixes host prep
        # (1-core-box contention-sensitive) with remote-tunnel jitter, and
        # the r02 driver capture showed 28% swings from a single sample
        passes = int(os.environ.get("ZANG_BENCH_SERVE_PASSES", 3))
        walls = []
        for _ in range(passes):
            t0 = time.time()
            results = br.run(jobs)
            walls.append(time.time() - t0)
            assert all(r.status == "ok" for r in results), \
                [r.error for r in results]
    audio = sum(r.seconds for r in results if r.status == "ok")
    rtf = audio / min(walls)
    _spread_note("bench_serve", walls)
    return rtf


def bench_fleet():
    """Tier-4 live serving: lanes concurrent sessions, one vmapped step per
    block; value = lanes * block_budget / median block time."""
    import numpy as np

    from zang_tpu.host import instruments as ti
    from zang_tpu.serve.live import LiveFleet

    lanes = int(os.environ.get("ZANG_BENCH_FLEET_LANES", 64))
    block = int(os.environ.get("ZANG_BENCH_FLEET_BLOCK", 4096))
    sr = 48000.0
    rng = np.random.default_rng(0)
    fleet = LiveFleet(lambda: [(ti.NiceInstrument(0.3), 4)], lanes, sr,
                      block_size=block)

    def push_all(release):
        for lane in range(lanes):
            f = float(np.float32(220.0 * 2 ** (rng.integers(0, 13) / 12.0)))
            nid = fleet.push_event(lane, 0, {"freq": f, "note_on": True})
            if release:
                fleet.push_event(lane, 0, {"freq": f, "note_on": False},
                                 note_id=nid)

    push_all(False)
    fleet.render_block()  # compile
    times = []
    for _ in range(8):
        push_all(True)
        t0 = time.time()
        fleet.render_block()  # np.asarray inside forces the full fetch
        times.append(time.time() - t0)
    # best-of, like _steady_rtf: remote-tunnel jitter (per-call RTT swings
    # of 1.5-2x run to run) is not part of the chip's steady-state capacity
    _spread_note("bench_fleet", times)
    bt = float(np.min(times))
    return lanes * (block / sr) / bt


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
    rtf = _steady_rtf(run, args, seconds, label="bench_song")
    emit(
        "bach_toccata_render_rtf_48k",
        round(rtf, 1),
        "x_realtime",
        round(rtf / 1000.0, 3),
    )


def _load1():
    try:
        return os.getloadavg()[0]
    except OSError:  # pragma: no cover
        return -1.0


def _dispatch_probe(label):
    """(min_ms, spread) of 5 tiny jitted dispatches — the tunnel-health
    signal. Sub-ms LOCAL dispatches jitter wildly in relative terms but
    are irrelevant; callers must pair spread with the min_ms floor."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: jnp.sum(x * jnp.float32(2.0)))
    x = jnp.ones((256, 256), jnp.float32)
    _first_run(f, (x,))
    lats = [_timed(f, (x,)) for _ in range(5)]
    spread = (max(lats) - min(lats)) / min(lats)
    print(f"# {label} dispatch_ms min={min(lats) * 1e3:.1f} "
          f"max={max(lats) * 1e3:.1f} spread={spread:.0%}", file=sys.stderr)
    return min(lats) * 1e3, spread


def _preflight():
    """Record the capture conditions (host load, tunnel dispatch latency)
    so a contended run is self-diagnosing: the r03 driver capture showed an
    across-the-board dip with 15% wall spread that took a bisect to clear —
    these lines make that call from the output alone."""
    import jax

    ncpu = os.cpu_count() or 1
    load1 = _load1()
    print(f"# preflight host_load1={load1:.2f} ncpu={ncpu} "
          f"backend={jax.default_backend()}", file=sys.stderr)
    min_ms, spread = _dispatch_probe("preflight")
    if load1 > 0.75 * ncpu:
        print("# preflight WARNING: host already loaded — serve/fleet "
              "metrics are host+tunnel-bound and will read LOW under "
              "contention; serialize against other work and rerun",
              file=sys.stderr)
    if spread > 0.5 and min_ms > 2.0:
        print("# preflight WARNING: tunnel dispatch latency is unstable "
              "(>50% spread) — expect noisy walls; best-of-N mitigates "
              "but does not remove this", file=sys.stderr)


def _wait_for_idle(label):
    """Bounded idle gate ahead of the contention-sensitive metrics: the
    r04 driver capture ran serve/fleet at host_load1=0.92 on a 1-core box
    (its own preflight warned) and recorded −57%/−48% garbage that a
    same-day idle rerun disproved. Waiting out a transient load spike is
    cheaper than a contaminated round artifact."""
    budget = float(os.environ.get("ZANG_BENCH_IDLE_WAIT", 600.0))
    target = float(os.environ.get("ZANG_BENCH_IDLE_LOAD", 0.35))
    ncpu = os.cpu_count() or 1
    thresh = target * ncpu
    deadline = time.time() + budget
    load1 = _load1()
    waited = False
    while load1 > thresh and time.time() < deadline:
        if not waited:
            print(f"# {label}: host_load1={load1:.2f} > {thresh:.2f} — "
                  f"waiting for idle (up to {budget:.0f} s)", file=sys.stderr)
        waited = True
        time.sleep(15.0)
        load1 = _load1()
    if waited or load1 > thresh:
        verdict = "idle" if load1 <= thresh else "STILL LOADED — proceeding"
        print(f"# {label}: host_load1={load1:.2f} after wait ({verdict})",
              file=sys.stderr)
    return load1 <= thresh


def _contention_sensitive(label, measure):
    """serve/fleet are host+tunnel-bound: gate on an idle host, then if
    the dispatch probe is unstable (>20% spread on a real remote floor),
    measure twice and keep the best, recording conditions either way."""
    _wait_for_idle(label)
    min_ms, spread = _dispatch_probe(label)
    value = measure()
    if spread > 0.2 and min_ms > 2.0:
        print(f"# {label}: tunnel unstable at probe time "
              f"(spread {spread:.0%}) — re-measuring once, reporting best",
              file=sys.stderr)
        value = max(value, measure())
    return value


def main():
    _probe_device()
    _preflight()

    from zang_tpu.host import song as sm

    seconds = float(os.environ.get("ZANG_BENCH_SECONDS", sm.NUM_SECONDS))
    chunk = int(os.environ.get("ZANG_BENCH_CHUNK", 65536))
    which = os.environ.get(
        "ZANG_BENCH_METRICS", "sampler,poly,serve,fleet,fidelity,song")
    which = {w.strip() for w in which.split(",") if w.strip()}

    if "sampler" in which:
        bench_sampler(chunk)
    if "poly" in which:
        bench_poly(chunk)
    if "serve" in which:
        rtf = _contention_sensitive("bench_serve", lambda: bench_serve(chunk))
        emit("batch_serve_rtf_aggregate", round(rtf, 1),
             "x_realtime_wav_delivery", round(rtf, 1))
    if "fleet" in which:
        sessions = _contention_sensitive("bench_fleet", bench_fleet)
        emit("live_fleet_sessions_per_chip", round(sessions, 1),
             "realtime_sessions", round(sessions, 1))
    if "fidelity" in which:
        bench_fidelity(seconds, chunk)
    if "song" in which:  # headline — keep last so it's the final JSON line
        bench_song(seconds, chunk)


if __name__ == "__main__":
    main()
