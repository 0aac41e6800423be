"""Short in-suite pass of the serving soak harness (tools/soak.py).

The real soak is the CLI (`python tools/soak.py --seconds 300`); this
keeps a bounded version of the same operational invariants in the suite:
clients stream for the whole window (including the final quarter), abrupt
churn drops don't wedge the server, and RSS growth after warmup stays
bounded. Serving tier only — no reference counterpart (the reference host
is single-process SDL, examples/example.zig:35-83)."""

import importlib.util
import os

import pytest

pytestmark = pytest.mark.slow

# load the tool WITHOUT putting tools/ on sys.path (tools/profile.py would
# shadow the stdlib profile module for the rest of the pytest process)
_TOOL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "tools", "soak.py")
_spec = importlib.util.spec_from_file_location("zang_soak_tool", _TOOL)
_soak = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_soak)
run_soak = _soak.run_soak


def test_soak_short():
    report = run_soak(seconds=25.0, clients=3, block=1024, key_blocks=16,
                      churn=True, rss_budget_mb=256.0, verbose=False)
    assert report["ok"], report["failures"]
    assert all(b > 0 for b in report["blocks_per_client"]), report
    assert report["stats_acks"] >= 1, report
    # every lane freed once the clients hung up
    assert report["num_clients_at_end"] == 0, report
