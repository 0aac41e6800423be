"""Oracle drift detection: every example's oracle render must match the
pinned SHA-256 in tests/oracle_fingerprints.json.

The golden sweep is engine-vs-oracle — RELATIVE — so an oracle edit that
shifts both sides together passes it silently while redefining the
reference semantics. These pins make oracle behavior changes loud: the
manifest only moves via a deliberate `python tools/oracle_fingerprints.py
--update` + commit (see that tool's docstring for the determinism scope,
incl. the detuned twin's engine-derived trajectory and jax upgrades).

Slow-marked: the full sweep is minutes of sequential oracle rendering.
"""

import importlib.util
import os

import pytest

pytestmark = pytest.mark.slow

_TOOL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "tools", "oracle_fingerprints.py")
_spec = importlib.util.spec_from_file_location("oracle_fingerprints", _TOOL)
ofp = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ofp)


def test_manifest_covers_every_example():
    from zang_tpu.host.examples import EXAMPLES

    manifest = ofp.load_manifest()
    missing = sorted(set(EXAMPLES) - set(manifest))
    assert not missing, (
        f"examples without oracle pins: {missing} — add WINDOW entries and "
        "run tools/oracle_fingerprints.py --update")
    assert sorted(set(ofp.WINDOW) - set(manifest)) == []


@pytest.mark.parametrize("name", sorted(ofp.WINDOW))
def test_oracle_fingerprint(name):
    manifest = ofp.load_manifest()
    assert name in manifest
    got = ofp.fingerprint(name)
    assert got == manifest[name], (
        f"{name}: oracle render changed (got {got[:16]}…, pinned "
        f"{manifest[name][:16]}…). If deliberate, review the behavior "
        "change, run tools/oracle_fingerprints.py --update, and commit the "
        "manifest bump; if not, an oracle twin drifted — see FIDELITY.md.")
