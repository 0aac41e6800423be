"""Aggregate pytest --durations=0 output into a per-file cost table.

Usage:
    python -m pytest tests/ -q --durations=0 > /tmp/suite.log
    python tools/suite_costs.py /tmp/suite.log

Prints one line per test file (total seconds, test count, slowest test)
sorted by cost, plus a suite total — the data behind the slow-marking
policy in CLAUDE.md (fast profile = `pytest -m "not slow"`).
"""
from __future__ import annotations

import re
import sys
from collections import defaultdict

# e.g. "12.34s call     tests/test_song.py::TestSong::test_full"
_LINE = re.compile(
    r"^\s*(\d+(?:\.\d+)?)s\s+(call|setup|teardown)\s+(tests/[^:\s]+)::(\S+)")


def main(path: str) -> int:
    per_file = defaultdict(float)
    per_file_n = defaultdict(set)
    slowest = {}
    with open(path) as f:
        for line in f:
            m = _LINE.match(line)
            if not m:
                continue
            secs, phase, fname, test = float(m[1]), m[2], m[3], m[4]
            per_file[fname] += secs
            if phase == "call":
                per_file_n[fname].add(test)
                if secs > slowest.get(fname, (0.0, ""))[0]:
                    slowest[fname] = (secs, test)
    if not per_file:
        print("no duration lines found (need pytest --durations=0 output)")
        return 1
    total = sum(per_file.values())
    print(f"{'file':<36} {'total_s':>8} {'tests':>6}  slowest")
    for fname in sorted(per_file, key=per_file.get, reverse=True):
        s, t = slowest.get(fname, (0.0, "-"))
        print(f"{fname:<36} {per_file[fname]:>8.1f} "
              f"{len(per_file_n[fname]):>6}  {s:.1f}s {t}")
    print(f"{'TOTAL':<36} {total:>8.1f} "
          f"{sum(len(v) for v in per_file_n.values()):>6}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/suite.log"))
