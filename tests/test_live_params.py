"""Live parameter control (host/params.py + LiveSession param API): the
reference host edits Parameter values mid-session with arrow keys and
Backspace-randomize (examples/common.zig:9-14, examples/example.zig:324-392)
and example_fmsynth exposes 22 of them (example_fmsynth.zig:375-398). Here a
change must land on the NEXT rendered block without re-jitting the device
step, and an untouched session must stay bit-close to the offline render."""

import random

import numpy as np
import pytest

from zang_tpu.core.notes import NoteTracker, SongEvent
from zang_tpu.core.span import Span
from zang_tpu.core.timeline import compile_timelines
from zang_tpu.graph.render import Performance, render_performance
from zang_tpu.host import instruments as ti
from zang_tpu.host.instruments import FMSynthInstrument
from zang_tpu.host.live import LiveSession
from zang_tpu.host.params import ParamSpec, ParamStore

SR = 48000.0
BLOCK = 1024


def rms_db(a, b):
    d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
    return 20 * np.log10(np.sqrt((d ** 2).mean()) + 1e-30)


def rms(a):
    return float(np.sqrt((np.asarray(a, np.float64) ** 2).mean()))


def fm_session(**inst_kw):
    live = LiveSession([(FMSynthInstrument(**inst_kw), 2)], SR, BLOCK)
    live.push_event(0, {"freq": 440.0, "note_on": True},
                    note_id=1, impulse_frame=0)
    return live


class TestParamStore:
    def test_clamp_and_step(self):
        store = ParamStore([ParamSpec("a", 16, default=8)])
        assert store.values["a"] == 8
        assert store.step("a", 100) == 15
        assert store.step("a", -1) == 14
        assert store.set("a", -5) == 0

    def test_unknown_name(self):
        store = ParamStore([ParamSpec("a", 4)])
        with pytest.raises(KeyError, match="unknown parameter"):
            store.set("b", 1)

    def test_duplicate_names_rejected(self):
        with pytest.raises(ValueError, match="duplicate"):
            ParamStore([ParamSpec("a", 4), ParamSpec("a", 8)])

    def test_randomize_favors_low(self):
        """example.zig:373-391: uniform draw squared when favor_low_values —
        over many seeded draws the favored param's mean must sit well below
        the unfavored one's."""
        store = ParamStore([ParamSpec("lo", 64, favor_low_values=True),
                            ParamSpec("hi", 64)])
        rng = random.Random(123)
        los, his = [], []
        for _ in range(400):
            vals = store.randomize(rng)
            los.append(vals["lo"])
            his.append(vals["hi"])
        assert max(los) <= 63 and max(his) <= 63 and min(los) >= 0
        # E[u^2] = 1/3 vs E[u] = 1/2 -> ratio 2/3
        assert np.mean(los) < np.mean(his) * 0.8

    def test_randomize_deterministic(self):
        mk = lambda: ParamStore([ParamSpec("a", 16), ParamSpec("b", 8)])
        a, b = mk(), mk()
        assert a.randomize(random.Random(7)) == b.randomize(random.Random(7))


class TestFMSynthSpecs:
    def test_full_reference_panel(self):
        """All 22 parameters of example_fmsynth.zig:375-398, same ranges."""
        specs = FMSynthInstrument().param_specs()
        assert len(specs) == 22
        by = {s.name: s for s in specs}
        assert by["mod_freq_mul"].num_values == 16
        assert by["mod_waveform"].num_values == 4
        assert by["mod_volume"].num_values == 64
        assert by["mod_feedback"].num_values == 8
        assert by["algorithm"].num_values == 2
        assert by["tremolo_depth"].num_values == 2
        # ADSR params are plan-kind (host-side envelope recompute), the
        # rest ride the per-block device vector
        plan = {n for n, s in by.items() if s.kind == "plan"}
        assert plan == {"mod_attack", "mod_decay", "mod_sustain",
                        "mod_release", "car_attack", "car_decay",
                        "car_sustain", "car_release"}
        assert by["mod_volume"].favor_low_values
        assert not by["mod_waveform"].favor_low_values

    def test_defaults_match_constructor(self):
        inst = FMSynthInstrument(mod_volume=7, mod_adr=(1, 2, 3, 4),
                                 algorithm=0)
        vals = ParamStore(inst.param_specs()).values
        assert vals["mod_volume"] == 7
        assert (vals["mod_attack"], vals["mod_decay"],
                vals["mod_sustain"], vals["mod_release"]) == (1, 2, 3, 4)
        assert vals["algorithm"] == 0


class TestLiveSessionParams:
    def test_untouched_params_match_offline(self):
        """With the param vector riding every block but never changed, the
        live render must match the offline baked-constant render (the live
        path multiplies by traced values instead of python floats; ulps)."""
        blocks = 6
        total = blocks * BLOCK
        song = [SongEvent({"freq": 440.0, "note_on": True}, t=0.0, note_id=1),
                SongEvent({"freq": 440.0, "note_on": False},
                          t=3 * BLOCK / SR, note_id=1)]
        tls = compile_timelines(song, 2, SR, total)
        offline = render_performance(
            Performance([(FMSynthInstrument(), tls)], SR), total,
            chunk_size=4096)

        live = LiveSession([(FMSynthInstrument(), 2)], SR, BLOCK)
        tracker = NoteTracker(song)
        out = []
        for _ in range(blocks):
            iap = tracker.consume(SR, Span(0, BLOCK))
            for imp, params in zip(iap.impulses, iap.paramses):
                live.push_event(0, params, note_id=imp.note_id,
                                impulse_frame=imp.frame)
            out.append(live.render_block())
        assert rms_db(np.concatenate(out, axis=1), offline) < -110.0

    def test_device_param_lands_next_block(self):
        """Carrier volume 0 -> 63 is a ~48 dB cut on the very next block
        (the reference applies new values on the next paint call,
        example.zig:324-392)."""
        live = fm_session()
        loud = live.render_block()
        live.set_param(0, "car_volume", 63)
        quiet = live.render_block()
        assert rms(loud) > 1e-3
        assert rms(quiet) < rms(loud) * 0.05

    def test_device_param_revert_is_bitexact(self):
        """A gain-only param doesn't touch device state: set + revert must
        leave every later block identical to a never-touched session."""
        a, b = fm_session(), fm_session()
        a.render_block()
        b.render_block()
        a.set_param(0, "car_volume", 63)
        a.render_block()
        b.render_block()
        a.set_param(0, "car_volume", 0)
        assert np.array_equal(a.render_block(), b.render_block())

    def test_device_param_mirrors_into_config(self):
        """A device-kind edit is mirrored into the instrument config too
        (apply_plan_params' documented guarantee, instruments.py): an
        offline plan()/render() of this instance matches the live values
        instead of keeping the constructor's."""
        live = fm_session()
        live.render_block()
        live.set_param(0, "mod_volume", 40)  # kind="device"
        inst = live.parts[0].instrument
        assert inst.cfg["mod_volume"] == 40
        from zang_tpu.host.instruments import _opl_volume

        assert inst.mod["volume"] == _opl_volume(40)

    def test_plan_param_lands_next_block(self):
        """Sustain level is plan-kind: the incremental planner repaints the
        open envelope segment with the new value. (Fast ADR indices — the
        default OPL attack of 0.41 s would still be rising at block 4.)"""
        live = fm_session(mod_adr=(15, 15, 0, 8), car_adr=(15, 15, 0, 8))
        live.render_blocks(3)  # deep into sustain
        before = rms(live.render_block())
        live.set_param(0, "car_sustain", 15)  # heavy sustain attenuation
        after = rms(live.render_block())
        assert before > 1e-3
        assert after < before * 0.2

    def test_algorithm_switch(self):
        """algorithm 1 (PM) vs 0 (additive) produce different audio on the
        next block (example_fmsynth.zig:295-311)."""
        live = fm_session()
        live.render_block()
        pm = live.render_block()
        live.set_param(0, "algorithm", 0)
        add = live.render_block()
        assert rms_db(pm, add) > -40.0  # clearly different signals

    def test_step_and_get(self):
        live = fm_session()
        assert live.get_params(0)["mod_feedback"] == 3
        assert live.step_param(0, "mod_feedback", 2) == 5
        assert live.step_param(0, "mod_feedback", 100) == 7  # clamped
        assert live.get_params(0)["mod_feedback"] == 7
        specs = live.param_specs(0)
        assert len(specs) == 22

    def test_randomize_params(self):
        live = fm_session()
        live.render_block()
        vals = live.randomize_params(0, rng=random.Random(11))
        assert set(vals) == {s.name for s in live.param_specs(0)}
        assert live.get_params(0) == vals
        out = live.render_block()
        assert np.all(np.isfinite(out))

    def test_no_params_instrument_raises(self):
        live = LiveSession([(ti.NiceInstrument(0.3), 2)], SR, BLOCK)
        assert live.param_specs(0) == []
        assert live.get_params(0) == {}
        with pytest.raises(ValueError, match="no live parameters"):
            live.set_param(0, "anything", 1)


class TestControllers:
    """Continuous-controller streams (the reference mouseEvent path,
    examples/example_mouse.zig): LiveSession.push_controller re-targets
    Portamento plan channels on the next block."""

    def _session(self, **env):
        import os

        from zang_tpu.host.instruments import MousePMInstrument

        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            live = LiveSession([(MousePMInstrument(), 1)], SR, BLOCK)
        finally:
            for k, v in old.items():
                os.environ.pop(k, None) if v is None else os.environ.__setitem__(k, v)
        live.push_event(0, {"freq": 440.0, "note_on": True},
                        note_id=1, impulse_frame=0)
        return live

    def test_controller_lands_next_block(self):
        a, b = self._session(), self._session()
        pre_a = a.render_blocks(2)
        pre_b = b.render_blocks(2)
        assert np.array_equal(pre_a, pre_b)
        a.push_controller(0, "x", 0.95)
        assert not np.array_equal(a.render_blocks(3), b.render_blocks(3))

    def test_incremental_matches_replan(self):
        """The IncPortamento walk must be bit-identical to the full
        re-plan path (ZANG_LIVE_INC=0) across controller moves."""
        a = self._session()
        b = self._session(ZANG_LIVE_INC="0")
        assert a.parts[0].planner is not None
        assert b.parts[0].planner is None
        out_a = [a.render_blocks(2)]
        out_b = [b.render_blocks(2)]
        for x, y in ((0.9, 0.1), (0.2, 0.8), (0.5, 0.5)):
            for s in (a, b):
                s.push_controller(0, "x", x)
                s.push_controller(0, "y", y)
            out_a.append(a.render_blocks(2))
            out_b.append(b.render_blocks(2))
        assert np.array_equal(np.concatenate(out_a, axis=1),
                              np.concatenate(out_b, axis=1))

    def test_out_of_order_frames_clamped_monotonic(self):
        """An explicit frame earlier than a previous move is clamped
        monotonic at push time: the incremental walk commits in order
        while the full-replan path sorts, so an unclamped past frame would
        silently drop the earlier move from ONE path only (bit-exactness
        break)."""
        a = self._session()
        b = self._session(ZANG_LIVE_INC="0")
        out_a = [a.render_blocks(2)]
        out_b = [b.render_blocks(2)]
        for s in (a, b):
            s.push_controller(0, "x", 0.9, frame=s.frame + 50000)
            s.push_controller(0, "x", 0.1)  # would land BEFORE the 0.9 move
        out_a.append(a.render_blocks(60))
        out_b.append(b.render_blocks(60))
        assert np.array_equal(np.concatenate(out_a, axis=1),
                              np.concatenate(out_b, axis=1))
        frames = [f for f, _ in a.parts[0].controllers["x"]]
        assert frames == sorted(frames)

    def test_live_matches_offline(self):
        """Same controller frames + note events -> live blocks equal the
        offline render (the offline config path bakes the trajectory in
        as the instrument's default controller stream)."""
        from zang_tpu.host.instruments import MousePMInstrument

        blocks = 6
        total = blocks * BLOCK
        moves = [(0, 0.5, 0.5), (2 * BLOCK, 0.9, 0.2), (4 * BLOCK, 0.1, 0.7)]
        ctl = {"x": [(f, x) for f, x, _ in moves],
               "y": [(f, y) for f, _, y in moves]}
        song = [SongEvent({"freq": 440.0, "note_on": True}, t=0.0,
                          note_id=1)]
        tls = compile_timelines(song, 1, SR, total)
        offline = render_performance(
            Performance([(MousePMInstrument(controllers=ctl), tls)], SR),
            total, chunk_size=2048)

        live = self._session()  # pushes the note at frame 0 itself
        out = []
        for b in range(blocks):
            for f, x, y in moves:
                if f == b * BLOCK and f > 0:
                    live.push_controller(0, "x", x)
                    live.push_controller(0, "y", y)
            out.append(live.render_block())
        # moves at frame 0 are the instrument defaults (0.5, 0.5) already
        assert rms_db(np.concatenate(out, axis=1), offline) < -110.0

    def test_unknown_controller_raises(self):
        live = self._session()
        with pytest.raises(ValueError, match="no controller"):
            live.push_controller(0, "z", 0.5)
        nice = LiveSession([(ti.NiceInstrument(0.3), 1)], SR, BLOCK)
        with pytest.raises(ValueError, match="no controller"):
            nice.push_controller(0, "x", 0.5)

    def test_snapshot_carries_controllers(self):
        a = self._session()
        a.render_block()
        a.push_controller(0, "x", 0.9)
        a.render_block()  # mid-glide
        blob = a.snapshot()
        ref = a.render_blocks(3)

        from zang_tpu.host.instruments import MousePMInstrument

        b = LiveSession([(MousePMInstrument(), 1)], SR, BLOCK)
        b.restore(blob)
        got = b.render_blocks(3)
        assert np.abs(ref).max() > 1e-4
        assert np.array_equal(ref, got)

    def test_mode_param_both_kinds(self):
        """mode is kind='both': flips the traced relative/absolute select
        on the next block AND the goal mapping of later moves."""
        live = self._session()
        live.render_block()
        rel = live.render_block()
        live.set_param(0, "mode", 1)
        absm = live.render_block()
        assert not np.array_equal(rel, absm)
        assert np.isfinite(absm).all()

    def test_server_controller_op(self):
        from zang_tpu.host.instruments import MousePMInstrument
        from zang_tpu.serve.server import LiveClient, LiveServer

        with LiveServer(lambda: [(MousePMInstrument(), 1)], SR, port=0,
                        initial_lanes=1, realtime=False,
                        block_size=BLOCK) as srv:
            c = LiveClient(srv.host, srv.port)
            try:
                c.send_controller(0, "x", 0.9)
                import time

                deadline = time.monotonic() + 10
                lane = srv.fleet.lanes[0]
                while len(lane.parts[0].controllers["x"]) < 2:
                    assert time.monotonic() < deadline
                    time.sleep(0.01)
                assert lane.parts[0].controllers["x"][-1][1] == 0.9
                with pytest.raises(RuntimeError, match="no controller"):
                    c.send_controller(0, "nope", 0.1)
                    c.stats()  # controller is fire-and-forget; force an ack
            finally:
                c.close()


class TestServerParams:
    """Wire ops: client -> server -> fleet lane (serve/server.py)."""

    def _server(self):
        from zang_tpu.serve.server import LiveServer

        return LiveServer(lambda: [(FMSynthInstrument(), 2)], SR,
                          port=0, initial_lanes=2, realtime=False,
                          block_size=BLOCK)

    def test_param_ops_over_the_wire(self):
        from zang_tpu.serve.server import LiveClient

        with self._server() as srv:
            c = LiveClient(srv.host, srv.port)
            try:
                info = c.params(0)
                assert len(info["specs"]) == 22
                assert info["values"]["mod_feedback"] == 3
                assert c.set_param(0, "car_volume", 63) == 63
                assert c.step_param(0, "mod_feedback", 2) == 5
                assert c.step_param(0, "mod_feedback", 99) == 7  # clamp
                vals = c.randomize_params(0, seed=5)
                assert set(vals) == {s["name"] for s in info["specs"]}
                # and the lane actually carries them
                assert srv.fleet.get_params(0, 0) == vals
            finally:
                c.close()

    def test_param_change_audible_over_stream(self):
        from zang_tpu.serve.server import LiveClient

        with self._server() as srv:
            c = LiveClient(srv.host, srv.port)
            try:
                c.send_event(0, {"freq": 440.0, "note_on": True})
                read_until_audible(c)
                # ride out the OPL attack (~0.41 s = 19 blocks), track peak
                loud = max(float(np.abs(c.read_block()).max())
                           for _ in range(25))
                c.set_param(0, "car_volume", 63)  # ~-48 dB
                # blocks rendered before the change may still be buffered
                quiet = read_until_quiet(c, loud * 0.05)
                assert quiet < loud * 0.05
            finally:
                c.close()

    def test_terminal_player_panel(self):
        """zang-play's panel keys: select/step/randomize drive the wire ops
        and the acks (on the reader thread) keep the local mirror current."""
        import time

        from zang_tpu.serve.client import TerminalPlayer
        from zang_tpu.serve.server import LiveClient

        def wait(pred, seconds=30):
            deadline = time.monotonic() + seconds
            while not pred():
                assert time.monotonic() < deadline, "timed out"
                time.sleep(0.01)

        with self._server() as srv:
            c = LiveClient(srv.host, srv.port)
            with TerminalPlayer(c, quiet=True) as player:
                player.param_select(1)  # fetches specs, selects #2
                assert player.param_specs is not None
                assert len(player.param_specs) == 22
                assert player.param_sel == 1
                name = player.param_specs[1]["name"]  # mod_waveform
                player.param_step(1)
                wait(lambda: player.param_values.get(name) == 1)
                assert srv.fleet.get_params(0, 0)[name] == 1
                before = dict(player.param_values)
                player.param_randomize()
                wait(lambda: player.param_values != before)
                assert srv.fleet.get_params(0, 0) == player.param_values

    def test_unknown_param_is_client_error(self):
        from zang_tpu.serve.server import LiveClient

        with self._server() as srv:
            c = LiveClient(srv.host, srv.port)
            try:
                with pytest.raises(RuntimeError, match="unknown parameter"):
                    c.set_param(0, "nope", 1)
            finally:
                c.close()


def read_until_audible(c, max_blocks=200):
    """Scan forward for the first audible block (the free-running server
    renders silent blocks before a just-sent event lands)."""
    for _ in range(max_blocks):
        p = float(np.abs(c.read_block()).max())
        if p > 100:
            return p
    raise AssertionError(f"no audible block within {max_blocks}")


def read_until_quiet(c, threshold, max_blocks=400):
    last = None
    for _ in range(max_blocks):
        last = float(np.abs(c.read_block()).max())
        if last < threshold:
            return last
    raise AssertionError(f"never decayed below {threshold}: last {last}")


class TestParamSnapshot:
    def test_snapshot_carries_params(self):
        """Migrating a session after param edits: the fresh host continues
        bit-exactly with the edited values (plan-kind values mutate the
        instrument config the spec fingerprint hashes, so they must be
        re-applied before the fingerprint check)."""
        a = fm_session()
        a.render_block()
        a.set_param(0, "car_volume", 20)
        a.set_param(0, "mod_feedback", 6)
        a.set_param(0, "car_sustain", 9)  # plan-kind
        a.render_block()
        blob = a.snapshot()
        ref = a.render_blocks(3)

        b = LiveSession([(FMSynthInstrument(), 2)], SR, BLOCK)
        b.restore(blob)
        assert b.get_params(0)["car_volume"] == 20
        assert b.get_params(0)["car_sustain"] == 9
        got = b.render_blocks(3)
        assert np.abs(ref).max() > 1e-4
        assert np.array_equal(ref, got)

    def test_fleet_param_isolation(self):
        """LiveFleet: a param change on one lane rides that lane's slice of
        the packed upload — the other lane's audio is untouched (bit-equal
        to a fleet that never changed anything)."""
        from zang_tpu.serve.live import LiveFleet

        def mk():
            f = LiveFleet(lambda: [(FMSynthInstrument(), 2)], 2, SR,
                          block_size=BLOCK)
            for lane in (0, 1):
                f.push_event(lane, 0, {"freq": 440.0, "note_on": True},
                             note_id=1, impulse_frame=0)
            f.render_block()
            return f

        a, b = mk(), mk()
        assert a.set_param(1, 0, "car_volume", 63) == 63
        out_a = a.render_block()
        out_b = b.render_block()
        # lane 0 bit-identical; lane 1 cut by ~48 dB
        assert np.array_equal(out_a[0], out_b[0])
        assert rms(out_a[1]) < rms(out_b[1]) * 0.05
        assert a.get_params(1)["car_volume"] == 63
        assert a.get_params(0)["car_volume"] == 0

    def test_fleet_lane_snapshot_carries_params(self):
        from zang_tpu.serve.live import LiveFleet

        f = LiveFleet(lambda: [(FMSynthInstrument(), 2)], 2, SR,
                      block_size=BLOCK)
        f.push_event(0, 0, {"freq": 330.0, "note_on": True},
                     note_id=1, impulse_frame=0)
        f.render_block()
        f.set_param(0, 0, "mod_feedback", 7)
        f.set_param(0, 0, "car_sustain", 6)  # plan-kind
        f.render_block()
        blob = f.snapshot_lane(0)
        ref = np.stack([f.render_block()[0] for _ in range(2)])

        g = LiveFleet(lambda: [(FMSynthInstrument(), 2)], 2, SR,
                      block_size=BLOCK)
        g.restore_lane(1, blob)
        assert g.get_params(1)["mod_feedback"] == 7
        got = np.stack([g.render_block()[1] for _ in range(2)])
        assert np.abs(ref).max() > 1e-4
        assert np.array_equal(ref, got)

    def test_snapshot_into_paramless_instrument_rejected(self):
        a = fm_session()
        a.render_block()
        blob = a.snapshot()
        b = LiveSession([(ti.NiceInstrument(0.3), 2)], SR, BLOCK)
        with pytest.raises(ValueError, match="spec mismatch"):
            b.restore(blob)
