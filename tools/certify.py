"""One-command round certification: suite -> multichip dryrun -> bench,
strictly serialized, one dated report.

Three rounds running, the driver's artifacts (BENCH_r*.json,
MULTICHIP_r*.json) disagreed with the builder's own measurements because
runs overlapped on a 1-core box (host contention skews every
host+tunnel-bound metric) or ran in an environment no one had re-verified
(the round-4 warm-persistent-cache dryrun). This runner is the fix: it
executes the three certification stages back to back, never concurrently,
in the same environment the driver uses, and writes CERTIFY.md at the
repo root with dated results the journal can cite.

Usage (from the repo root):
    python tools/certify.py                # all three stages
    python tools/certify.py --skip bench   # e.g. while the tunnel is down
    python tools/certify.py --fast         # fast test profile (-m "not slow")

Stage details:
  suite   python -m pytest tests/ -q --durations=0   (log: /tmp/certify_suite.log;
          feed it to tools/suite_costs.py to refresh tests/slow_tests.txt)
  dryrun  __graft_entry__.dryrun_multichip(8) in a subprocess — the exact
          driver check, including the warm persistent XLA:CPU compile cache
  bench   python bench.py — includes its own device probe, idle gate and
          unstable-tunnel retry for the contention-sensitive metrics
"""
from __future__ import annotations

import argparse
import datetime
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    # EXTEND PYTHONPATH (overriding drops /root/.axon_site and kills the
    # remote TPU backend for the bench stage)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run(cmd, log_path, timeout):
    t0 = time.time()
    with open(log_path, "wb") as log:
        try:
            proc = subprocess.run(cmd, cwd=REPO, env=_env(), stdout=log,
                                  stderr=subprocess.STDOUT, timeout=timeout)
            rc = proc.returncode
        except subprocess.TimeoutExpired:
            rc = -1
    return rc, time.time() - t0


def _tail(path, n=20):
    try:
        with open(path, errors="replace") as f:
            return "".join(f.readlines()[-n:])
    except OSError:
        return "(no log)"


def stage_suite(report, fast):
    log = "/tmp/certify_suite.log"
    cmd = [sys.executable, "-m", "pytest", "tests/", "-q", "--durations=0"]
    if fast:
        cmd += ["-m", "not slow"]
    rc, wall = _run(cmd, log, timeout=3 * 3600)
    tail = _tail(log, 5)
    m = re.search(r"(\d+ passed[^\n=]*)", tail)
    if m:
        summary = m.group(1).strip()
    else:  # collection error / 'no tests ran' / empty log after timeout
        lines = tail.strip().splitlines()
        summary = lines[-1] if lines else "(no output)"
    report["suite"] = {"rc": rc, "wall_s": round(wall, 1),
                       "summary": summary, "log": log,
                       "profile": "fast" if fast else "full"}
    print(f"suite: rc={rc} {summary} ({wall / 60:.1f} min)")
    return rc == 0


def stage_dryrun(report):
    log = "/tmp/certify_dryrun.log"
    code = ("import __graft_entry__ as g; g.dryrun_multichip(8); "
            "print('CERTIFY_DRYRUN_OK')")
    rc, wall = _run([sys.executable, "-c", code], log, timeout=3600)
    # search the WHOLE log for the marker: unbuffered stderr (absl E-log
    # lines, backend teardown) can land after stdout's exit-time flush,
    # so requiring the marker in the last lines false-fails a passing run
    try:
        with open(log, errors="replace") as f:
            ok = rc == 0 and "CERTIFY_DRYRUN_OK" in f.read()
    except OSError:
        ok = False
    report["dryrun"] = {"rc": rc, "ok": ok, "wall_s": round(wall, 1),
                        "log": log}
    print(f"dryrun: rc={rc} ok={ok} ({wall / 60:.1f} min)")
    return ok


def stage_bench(report):
    log = "/tmp/certify_bench.log"
    rc, wall = _run([sys.executable, "bench.py"], log, timeout=2 * 3600)
    metrics = []
    try:
        with open(log, errors="replace") as f:
            for line in f:
                if line.startswith("{"):
                    try:
                        metrics.append(json.loads(line))
                    except ValueError:
                        pass
    except OSError:
        pass
    report["bench"] = {"rc": rc, "wall_s": round(wall, 1),
                       "metrics": metrics, "log": log}
    print(f"bench: rc={rc} {len(metrics)} metrics ({wall / 60:.1f} min)")
    for m in metrics:
        print(f"  {m['metric']}: {m['value']} {m['unit']}")
    return rc == 0 and metrics


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", action="append", default=[],
                    choices=["suite", "dryrun", "bench"])
    ap.add_argument("--fast", action="store_true",
                    help='suite uses -m "not slow"')
    args = ap.parse_args(argv)

    head = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
                          capture_output=True, text=True).stdout.strip()
    porcelain = subprocess.run(["git", "status", "--porcelain"], cwd=REPO,
                               capture_output=True, text=True).stdout
    # CERTIFY.md is this tool's own output: a leftover from the previous
    # run must not make every second certification self-report dirty
    dirty = bool([ln for ln in porcelain.splitlines()
                  if ln.strip() and not ln.endswith("CERTIFY.md")])
    when = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    report = {"when": when, "head": head, "dirty": dirty,
              "ncpu": os.cpu_count(), "load1_at_start": os.getloadavg()[0]}
    print(f"certify @ {head}{'+dirty' if dirty else ''} {when} "
          f"ncpu={report['ncpu']} load1={report['load1_at_start']:.2f}")
    all_ok = True
    for name, fn in (("suite", lambda: stage_suite(report, args.fast)),
                     ("dryrun", lambda: stage_dryrun(report)),
                     ("bench", lambda: stage_bench(report))):
        if name in args.skip:
            report[name] = {"skipped": True}
            continue
        all_ok = bool(fn()) and all_ok

    report["ok"] = all_ok
    lines = [
        "# Certification report",
        "",
        f"Generated by tools/certify.py — {when}, HEAD {head}"
        f"{' (dirty tree)' if dirty else ''}, "
        f"ncpu={report['ncpu']}, start load1={report['load1_at_start']:.2f}.",
        "Stages ran strictly serialized (suite -> dryrun -> bench); raw "
        "logs under /tmp/certify_*.log.", "",
    ]
    for name in ("suite", "dryrun", "bench"):
        st = report.get(name, {})
        if st.get("skipped"):
            lines.append(f"- **{name}**: skipped")
        elif name == "bench":
            lines.append(f"- **bench**: rc={st['rc']} "
                         f"({st['wall_s'] / 60:.1f} min)")
            for m in st.get("metrics", []):
                lines.append(f"    - {m['metric']}: {m['value']} {m['unit']}")
        elif name == "suite":
            lines.append(f"- **suite** ({st['profile']}): rc={st['rc']} — "
                         f"{st['summary']} ({st['wall_s'] / 60:.1f} min)")
        else:
            lines.append(f"- **dryrun**: ok={st['ok']} "
                         f"({st['wall_s'] / 60:.1f} min)")
    lines += ["", f"**Overall: {'OK' if all_ok else 'FAILED'}**", "",
              "```json", json.dumps(report, indent=1), "```", ""]
    out = os.path.join(REPO, "CERTIFY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"report -> {out} (overall {'OK' if all_ok else 'FAILED'})")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
