"""Session snapshot/restore (host/snapshot.py): migrate a playing live
session — or a fleet lane — to a fresh host bit-exactly. The reference has
no session persistence (SURVEY.md §5: "resume" is init()); the serving
tier adds it for drain/rebalance/restart."""

import numpy as np
import pytest

from zang_tpu.host import instruments as ti
from zang_tpu.host.live import LiveSession
from zang_tpu.serve.live import LiveFleet

SR = 48000.0
BLOCK = 1024


def make_session(**kw):
    return LiveSession([(ti.NiceInstrument(0.3), 3)], SR, BLOCK, **kw)


class TestSessionSnapshot:
    def test_bitexact_continuation_native(self):
        a = make_session()
        a.key_event(0, "z", True)
        a.render_blocks(3)
        a.key_event(0, "q", True)
        a.render_blocks(2)
        blob = a.snapshot()
        a.key_event(0, "z", False)
        ref = a.render_blocks(6)

        b = make_session()
        b.restore(blob)
        b.key_event(0, "z", False)
        got = b.render_blocks(6)
        assert np.abs(ref).max() > 1e-4
        assert np.array_equal(ref, got)

    def test_queued_events_survive(self):
        a = make_session()
        a.render_block()
        a.push_event(0, {"freq": 330.0, "note_on": True})
        blob = a.snapshot()
        ref = a.render_blocks(2)
        b = make_session()
        b.restore(blob)
        got = b.render_blocks(2)
        assert np.abs(ref).max() > 0
        assert np.array_equal(ref, got)

    def test_note_ids_continue(self):
        """The id generator's position is state: ids issued after restore
        must not collide with held notes from before the snapshot."""
        a = make_session()
        nid = a.key_event(0, "z", True)
        a.render_block()
        blob = a.snapshot()
        b = make_session()
        b.restore(blob)
        nid2 = b.push_event(0, {"freq": 220.0, "note_on": True})
        assert nid2 > nid
        # and the held key releases through the restored tracker
        assert b.key_event(0, "z", False) == nid

    def test_script_instrument_session(self):
        from zang_tpu.script import compile_script
        from zang_tpu.script.jax_backend import ScriptInstrument

        src = """
V = defmodule freq: cob, note_on: boolean, begin
    e = Envelope(attack=.cubed(0.02), decay=.cubed(0.1),
                 release=.linear(0.3), sustain_volume=0.8, note_on)
    f = Filter(input=PulseOsc(freq, color=0.4), type=.low_pass,
               res=0.7, cutoff=0.2)
    out e * f * 0.5
end
"""
        cs = compile_script(src)

        def mk():
            return LiveSession([(ScriptInstrument(cs, "V"), 2)], 44100.0,
                               BLOCK)

        a = mk()
        a.key_event(0, "q", True)
        a.render_blocks(3)
        a.key_event(0, "w", True)
        a.render_blocks(2)
        blob = a.snapshot()
        a.key_event(0, "q", False)
        ref = a.render_blocks(6)

        b = mk()
        b.restore(blob)
        b.key_event(0, "q", False)
        got = b.render_blocks(6)
        assert np.abs(ref).max() > 1e-4
        assert np.array_equal(ref, got)

    def test_replan_path_session(self, monkeypatch):
        """ZANG_LIVE_INC=0 sessions (no incremental planners) snapshot via
        their segment history alone."""
        monkeypatch.setenv("ZANG_LIVE_INC", "0")
        a = make_session()
        a.key_event(0, "z", True)
        a.render_blocks(2)
        blob = a.snapshot()
        ref = a.render_blocks(3)
        b = make_session()
        b.restore(blob)
        got = b.render_blocks(3)
        assert np.array_equal(ref, got)

    def test_spec_mismatch_rejected(self):
        a = make_session()
        a.render_block()
        blob = a.snapshot()
        b = LiveSession([(ti.NiceInstrument(0.3), 5)], SR, BLOCK)
        with pytest.raises(ValueError, match="spec mismatch"):
            b.restore(blob)

    def test_instrument_config_mismatch_rejected(self):
        """The fingerprint hashes instrument CONFIG, not just the class:
        state saved from NiceInstrument(0.3) must not graft onto a
        NiceInstrument(0.7) session and silently change the sound."""
        a = make_session()
        a.render_block()
        blob = a.snapshot()
        b = LiveSession([(ti.NiceInstrument(0.7), 3)], SR, BLOCK)
        with pytest.raises(ValueError, match="spec mismatch"):
            b.restore(blob)

    def test_restore_needs_fresh_target(self):
        a = make_session()
        blob = a.snapshot()
        b = make_session()
        b.render_block()
        with pytest.raises(ValueError, match="fresh"):
            b.restore(blob)


class TestFleetMigration:
    def test_lane_migrates_between_fleets(self):
        """Snapshot a mid-phrase lane on fleet A, restore into fleet B: the
        migrated lane's stream continues bit-exactly."""
        mk_parts = lambda: [(ti.NiceInstrument(0.3), 2)]
        A = LiveFleet(mk_parts, 2, SR, block_size=BLOCK)
        A.push_event(0, 0, {"freq": 220.0, "note_on": True})
        A.push_event(1, 0, {"freq": 440.0, "note_on": True})
        A.render_blocks(3)
        A.push_event(1, 0, {"freq": 550.0, "note_on": True})
        A.render_blocks(2)
        blob = A.snapshot_lane(1)
        ref = A.render_blocks(5)[1]  # lane 1's future, no new events

        B = LiveFleet(mk_parts, 2, SR, block_size=BLOCK)
        B.restore_lane(0, blob)
        got = B.render_blocks(5)[0]
        assert np.abs(ref).max() > 1e-4
        assert np.array_equal(ref, got)
        A.close()
        B.close()

    def test_snapshot_before_first_block(self):
        """A lane snapshotted before the fleet ever rendered restores from
        its session-held (fresh) state."""
        mk_parts = lambda: [(ti.NiceInstrument(0.3), 2)]
        A = LiveFleet(mk_parts, 1, SR, block_size=BLOCK)
        A.push_event(0, 0, {"freq": 440.0, "note_on": True})
        blob = A.snapshot_lane(0)
        ref = A.render_blocks(3)[0]
        B = LiveFleet(mk_parts, 1, SR, block_size=BLOCK)
        B.restore_lane(0, blob)
        got = B.render_blocks(3)[0]
        assert np.abs(ref).max() > 0
        assert np.array_equal(ref, got)
        A.close()
        B.close()

    def test_restore_into_detached_slot(self):
        """Migration receive side: attach-by-restore into a detached slot."""
        mk_parts = lambda: [(ti.NiceInstrument(0.3), 2)]
        A = LiveFleet(mk_parts, 2, SR, block_size=BLOCK)
        A.push_event(1, 0, {"freq": 440.0, "note_on": True})
        A.render_blocks(2)
        blob = A.snapshot_lane(1)
        ref = A.render_blocks(3)[1]

        B = LiveFleet(mk_parts, 2, SR, block_size=BLOCK)
        B.render_blocks(1)  # stacked state exists
        B.detach_lane(1)
        B.restore_lane(1, blob)
        got = B.render_blocks(3)[1]
        assert 1 in B.active_lanes
        assert np.array_equal(ref[:, :],
                              got[:, :])
        A.close()
        B.close()
