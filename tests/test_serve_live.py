"""Live serving fleet (serve/live.py): N concurrent sessions, one vmapped
device step, bit-equal to N independent LiveSessions fed the same events."""

import numpy as np
import pytest

from zang_tpu.host import instruments as ti
from zang_tpu.host.live import LiveSession
from zang_tpu.serve.live import LiveFleet

SR = 48000.0
BLOCK = 1024


def _events(seed, n_notes=6):
    rng = np.random.default_rng(seed)
    evs = []
    for i in range(n_notes):
        f = float(np.float32(220.0 * 2 ** (rng.integers(0, 13) / 12.0)))
        evs.append((i, {"freq": f, "note_on": True}, i + 1))
        evs.append((i + 1, {"freq": f, "note_on": False}, i + 1))
    by_block = {}
    for blk, params, nid in evs:
        by_block.setdefault(blk, []).append((params, nid))
    return by_block


def _drive(push, by_block, blk, lane=None):
    for params, nid in by_block.get(blk, []):
        if lane is None:
            push(0, params, note_id=nid)
        else:
            push(lane, 0, params, note_id=nid)


class TestFleetMatchesSessions:
    def test_three_lanes_bit_equal(self):
        n_blocks = 10
        seeds = [1, 2, 3]
        fleet = LiveFleet(lambda: [(ti.NiceInstrument(0.3), 3)], 3, SR,
                          block_size=BLOCK)
        singles = [LiveSession([(ti.NiceInstrument(0.3), 3)], SR, BLOCK)
                   for _ in seeds]
        streams = [_events(s) for s in seeds]

        fleet_out = []
        single_out = [[] for _ in seeds]
        for blk in range(n_blocks):
            for lane, bb in enumerate(streams):
                _drive(fleet.push_event, bb, blk, lane=lane)
                _drive(singles[lane].push_event, bb, blk)
            fleet_out.append(fleet.render_block())
            for lane in range(len(seeds)):
                single_out[lane].append(singles[lane].render_block())
        fleet_all = np.concatenate(fleet_out, axis=2)
        for lane in range(len(seeds)):
            ref = np.concatenate(single_out[lane], axis=1)
            # identical arithmetic up to XLA reassociation under vmap:
            # ulp-level only
            assert np.abs(fleet_all[lane] - ref).max() < 1e-6, f"lane {lane}"
        assert np.abs(fleet_all).max() > 0.01

    def test_script_instrument_lanes(self):
        from zang_tpu.script import compile_script
        from zang_tpu.script.jax_backend import ScriptInstrument

        src = """
V = defmodule freq: cob, note_on: boolean, begin
    e = Envelope(attack=.cubed(0.02), decay=.cubed(0.1),
                 release=.linear(0.3), sustain_volume=0.8, note_on)
    out e * PulseOsc(freq, color=0.4) * 0.5
end
"""
        cs = compile_script(src)

        def make_parts():
            return [(ScriptInstrument(cs, "V"), 2)]

        fleet = LiveFleet(make_parts, 2, 44100.0, block_size=BLOCK)
        singles = [LiveSession(make_parts(), 44100.0, BLOCK) for _ in range(2)]
        streams = [_events(7), _events(8)]
        outs, refs = [], [[], []]
        for blk in range(8):
            for lane, bb in enumerate(streams):
                _drive(fleet.push_event, bb, blk, lane=lane)
                _drive(singles[lane].push_event, bb, blk)
            outs.append(fleet.render_block())
            for lane in range(2):
                refs[lane].append(singles[lane].render_block())
        fleet_all = np.concatenate(outs, axis=2)
        for lane in range(2):
            ref = np.concatenate(refs[lane], axis=1)
            assert np.abs(fleet_all[lane] - ref).max() < 1e-6, f"lane {lane}"
        assert np.abs(fleet_all).max() > 0.01


class TestFleetSharded:
    def test_lane_sharded_matches_unsharded(self):
        """8 lanes sharded over the 8-device virtual mesh == unsharded
        fleet, block for block (pure annotation; no collectives)."""
        import jax
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:8]), ("lanes",))
        make = lambda: [(ti.NiceInstrument(0.3), 2)]
        sharded = LiveFleet(make, 8, SR, block_size=BLOCK, mesh=mesh)
        plain = LiveFleet(make, 8, SR, block_size=BLOCK)
        streams = [_events(10 + lane) for lane in range(8)]
        outs_s, outs_p = [], []
        for blk in range(6):
            for lane, bb in enumerate(streams):
                _drive(sharded.push_event, bb, blk, lane=lane)
                _drive(plain.push_event, bb, blk, lane=lane)
            outs_s.append(sharded.render_block())
            outs_p.append(plain.render_block())
        a = np.concatenate(outs_s, axis=2)
        b = np.concatenate(outs_p, axis=2)
        assert np.abs(a - b).max() < 1e-6
        assert np.abs(a).max() > 0.01

    def test_lane_count_must_divide_mesh(self):
        import jax
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:8]), ("lanes",))
        with pytest.raises(ValueError, match="multiple of the mesh"):
            LiveFleet(lambda: [(ti.NiceInstrument(0.3), 2)], 6, SR,
                      block_size=BLOCK, mesh=mesh)


class TestFleetElastic:
    def test_attach_grows_and_keeps_existing_audio(self):
        """A lane attaching mid-stream must not disturb lanes already
        playing: lane 0's audio is bit-equal to an undisturbed session."""
        make = lambda: [(ti.NiceInstrument(0.3), 3)]
        fleet = LiveFleet(make, 2, SR, block_size=BLOCK)
        single = LiveSession(make(), SR, BLOCK)
        bb = _events(3)
        out0, ref0 = [], []
        for blk in range(6):
            _drive(fleet.push_event, bb, blk, lane=0)
            _drive(single.push_event, bb, blk)
            if blk == 2:  # grow: 2 -> 4 slots, attach one
                lane = fleet.attach_lane()
                assert lane == 2 and fleet.num_lanes == 4
                fleet.push_event(lane, 0, {"freq": 330.0, "note_on": True})
            out0.append(fleet.render_block()[0])
            ref0.append(single.render_block())
        a = np.concatenate(out0, axis=1)
        b = np.concatenate(ref0, axis=1)
        assert np.abs(a - b).max() < 1e-6
        assert sorted(fleet.active_lanes) == [0, 1, 2]

    def test_detach_frees_slot_and_silences(self):
        fleet = LiveFleet(lambda: [(ti.NiceInstrument(0.3), 2)], 2, SR,
                          block_size=BLOCK)
        fleet.push_event(1, 0, {"freq": 440.0, "note_on": True})
        fleet.render_block()
        fleet.detach_lane(1)
        out = fleet.render_block()
        assert np.abs(out[1]).max() < 1e-6  # fresh slot: silence
        with pytest.raises(ValueError, match="detached"):
            fleet.push_event(1, 0, {"freq": 440.0, "note_on": True})
        with pytest.raises(ValueError, match="already detached"):
            fleet.detach_lane(1)
        # attach reuses the freed slot without growing
        assert fleet.attach_lane() == 1
        assert fleet.num_lanes == 2
        fleet.push_event(1, 0, {"freq": 440.0, "note_on": True})
        out = fleet.render_block()
        assert np.abs(out[1]).max() > 1e-4


class TestFleetPipelined:
    def test_async_double_buffer_bit_equal(self):
        """render_block_async with two blocks in flight (dispatch N+1
        before fetching N — the RTT-hiding serving mode) must produce the
        same audio, block for block, as synchronous render_block."""
        make = lambda: [(ti.NiceInstrument(0.3), 3)]
        piped = LiveFleet(make, 2, SR, block_size=BLOCK)
        plain = LiveFleet(make, 2, SR, block_size=BLOCK)
        streams = [_events(21), _events(22)]
        n_blocks = 8
        pending, outs_a, outs_s = [], [], []
        for blk in range(n_blocks):
            for lane, bb in enumerate(streams):
                _drive(piped.push_event, bb, blk, lane=lane)
                _drive(plain.push_event, bb, blk, lane=lane)
            pending.append(piped.render_block_async())
            if len(pending) > 2:
                outs_a.append(np.asarray(pending.pop(0)))
            outs_s.append(plain.render_block())
        outs_a.extend(np.asarray(p) for p in pending)
        a = np.concatenate(outs_a, axis=2)
        b = np.concatenate(outs_s, axis=2)
        assert a.shape == b.shape
        assert np.array_equal(a, b)  # same jitted step, same inputs
        assert np.abs(a).max() > 0.01


class TestFleetPcm16:
    def test_device_mixdown_matches_host(self):
        """pcm16_volume fleets must return exactly the host-side
        mixdown_s16 of the f32 fleet's output (mixdown.zig clamp/NaN
        semantics, computed on device)."""
        from zang_tpu.core.mixdown import mixdown_s16_np

        make = lambda: [(ti.NiceInstrument(0.3), 3)]
        pcm = LiveFleet(make, 2, SR, block_size=BLOCK, pcm16_volume=0.5)
        f32 = LiveFleet(make, 2, SR, block_size=BLOCK)
        streams = [_events(31), _events(32)]
        outs_p, outs_f = [], []
        for blk in range(6):
            for lane, bb in enumerate(streams):
                _drive(pcm.push_event, bb, blk, lane=lane)
                _drive(f32.push_event, bb, blk, lane=lane)
            outs_p.append(pcm.render_block())
            outs_f.append(f32.render_block())
        a = np.concatenate(outs_p, axis=2)
        ref = mixdown_s16_np(np.concatenate(outs_f, axis=2), 0.5)
        assert a.dtype == np.int16
        assert np.array_equal(a, ref)
        assert np.abs(a).max() > 100


class TestFleetWarmup:
    def test_warmup_then_render_matches(self):
        """warmup() (incl. a future growth size) must not perturb real
        rendering: output equals an un-warmed fleet's."""
        make = lambda: [(ti.NiceInstrument(0.3), 2)]
        warm = LiveFleet(make, 2, SR, block_size=BLOCK, prewarm=True)
        warm.warmup([2, 4])
        plain = LiveFleet(make, 2, SR, block_size=BLOCK)
        bb = _events(5)
        outs_w, outs_p = [], []
        for blk in range(4):
            _drive(warm.push_event, bb, blk, lane=0)
            _drive(plain.push_event, bb, blk, lane=0)
            outs_w.append(warm.render_block())
            outs_p.append(plain.render_block())
        a = np.concatenate(outs_w, axis=2)
        b = np.concatenate(outs_p, axis=2)
        assert np.abs(a - b).max() < 1e-6
        lane = warm.attach_lane()  # growth size 4 was prewarmed
        warm.push_event(lane, 0, {"freq": 330.0, "note_on": True})
        out = warm.render_block()
        assert out.shape[0] == 4 and np.abs(out[lane]).max() > 1e-4
        warm.close(timeout=120)


class TestFleetOps:
    def test_lane_reset_isolated(self):
        fleet = LiveFleet(lambda: [(ti.NiceInstrument(0.3), 2)], 2, SR,
                          block_size=BLOCK)
        bb = _events(4)
        for blk in range(3):
            _drive(fleet.push_event, bb, blk, lane=0)
            _drive(fleet.push_event, bb, blk, lane=1)
            fleet.render_block()
        fleet.reset_lane(1)
        # lane 1 restarts from silence/frame 0; lane 0 keeps ringing
        out = fleet.render_block()
        assert np.abs(out[0]).max() > 1e-4
        assert np.abs(out[1]).max() < 1e-6
        assert fleet.lanes[1].frame == BLOCK
        assert fleet.lanes[0].frame == 4 * BLOCK

    def test_pending_reset_survives_transient_error(self):
        """A device error during the reset insertion must re-queue the
        reset: the retrying caller's next block must NOT leave the lane
        with its previous user's stacked state (review finding: the old
        code popped _pending_reset before applying it)."""
        fleet = LiveFleet(lambda: [(ti.NiceInstrument(0.3), 2)], 2, SR,
                          block_size=BLOCK)
        fleet.push_event(0, 0, {"freq": 330.0, "note_on": True})
        fleet.render_block()
        assert np.abs(fleet.render_block()[0]).max() > 1e-4
        fleet.reset_lane(0)
        orig = fleet.lanes[0]._ensure_states
        calls = {"n": 0}

        def flaky():
            if calls["n"] == 0:
                calls["n"] += 1
                raise RuntimeError("transient device error")
            return orig()

        fleet.lanes[0]._ensure_states = flaky
        with pytest.raises(RuntimeError, match="transient"):
            fleet.render_block()
        out = fleet.render_block()  # retry: the reset must still apply
        assert calls["n"] == 1
        assert np.abs(out[0]).max() < 1e-6, "lane kept its old state"

    def test_capacity_growth_is_fleet_wide(self):
        fleet = LiveFleet(lambda: [(ti.NiceInstrument(0.3), 2)], 2, SR,
                          block_size=BLOCK, slot_capacity=2)
        # dense burst on lane 0 only
        for i in range(12):
            f = 220.0 * 2 ** ((i % 12) / 12.0)
            nid = fleet.push_event(0, 0, {"freq": f, "note_on": True},
                                   impulse_frame=i * 80)
            fleet.push_event(0, 0, {"freq": f, "note_on": False},
                             note_id=nid, impulse_frame=i * 80 + 40)
        out = fleet.render_block()
        assert np.isfinite(out).all()
        assert fleet.lanes[0].slot_capacity == fleet.lanes[1].slot_capacity
        assert fleet.lanes[0].slot_capacity > 2
