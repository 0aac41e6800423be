"""Live host (host/live.py): block-by-block interactive rendering must
match the offline chunked renderer given the same note segments, and the
event path (queue -> dispatcher -> trigger) must behave like the offline
timeline compiler."""

import numpy as np

from zang_tpu.core.timeline import SubvoiceTimeline, compile_timelines
from zang_tpu.core.notes import NoteTracker, SongEvent
from zang_tpu.core.span import Span
from zang_tpu.graph.render import Performance, render_performance
from zang_tpu.host import instruments as ti
from zang_tpu.host.live import LiveSession

SR = 48000.0
BLOCK = 1024


def rms_db(a, b):
    d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
    return 20 * np.log10(np.sqrt((d ** 2).mean()) + 1e-30)


class TestLiveMatchesOffline:
    def test_single_voice_pmosc(self):
        blocks = 16
        total = blocks * BLOCK
        song = [
            SongEvent({"freq": 440.0, "note_on": True}, t=0.0, note_id=1),
            SongEvent({"freq": 330.0, "note_on": True},
                      t=4 * BLOCK / SR, note_id=2),
            SongEvent({"freq": 330.0, "note_on": False},
                      t=9 * BLOCK / SR, note_id=2),
        ]
        tls = compile_timelines(song, 1, SR, total)
        offline = render_performance(
            Performance([(ti.PMOscInstrument(0.4), tls)], SR), total,
            chunk_size=4096)

        live = LiveSession([(ti.PMOscInstrument(0.4), 1)], SR, BLOCK)
        tracker = NoteTracker(song)  # same f32 frame quantization as offline
        out = []
        for b in range(blocks):
            iap = tracker.consume(SR, Span(0, BLOCK))
            for imp, params in zip(iap.impulses, iap.paramses):
                live.push_event(0, params, note_id=imp.note_id,
                                impulse_frame=imp.frame)
            out.append(live.render_block())
        live_audio = np.concatenate(out, axis=1)

        assert live_audio.shape == offline.shape
        # same segments -> same per-sample values; flat vs tiled program
        # evaluation and the filter scan differ by ulps only
        assert rms_db(live_audio, offline) < -110.0

    def test_polyphonic_nice_with_stealing(self):
        blocks = 12
        total = blocks * BLOCK
        poly = 2
        notes = [(0, 440.0, 1), (2, 550.0, 2), (4, 660.0, 3)]  # 3 on 2 slots
        song = []
        for blk, f, nid in notes:
            song.append(SongEvent({"freq": f, "note_on": True},
                                  t=blk * BLOCK / SR, note_id=nid))
            song.append(SongEvent({"freq": f, "note_on": False},
                                  t=(blk + 5) * BLOCK / SR, note_id=nid))
        song.sort(key=lambda e: e.t)
        tls = compile_timelines(song, poly, SR, total)
        offline = render_performance(
            Performance([(ti.NiceInstrument(0.3), tls)], SR), total,
            chunk_size=4096)

        live = LiveSession([(ti.NiceInstrument(0.3), poly)], SR, BLOCK)
        tracker = NoteTracker(song)
        out = []
        for b in range(blocks):
            iap = tracker.consume(SR, Span(0, BLOCK))
            for imp, params in zip(iap.impulses, iap.paramses):
                live.push_event(0, params, note_id=imp.note_id,
                                impulse_frame=imp.frame)
            out.append(live.render_block())
        live_audio = np.concatenate(out, axis=1)
        assert rms_db(live_audio, offline) < -110.0


class TestKeyEvents:
    def test_keyboard_note_ids_pair_on_off(self):
        live = LiveSession([(ti.NiceInstrument(0.3), 3)], SR, BLOCK)
        held = {}
        nid_on = live.key_event(0, "z", True, note_ids=held)
        assert nid_on is not None and held["z"] == nid_on
        blk1 = live.render_block()
        nid_off = live.key_event(0, "z", False, note_ids=held)
        assert nid_off == nid_on and "z" not in held
        blk2 = live.render_block()
        # release tail keeps sounding, then decays
        tail = live.render_blocks(20)
        assert np.abs(blk1).max() > 1e-4
        assert np.abs(tail[:, -BLOCK:]).max() < np.abs(blk2).max()

    def test_unknown_key_ignored(self):
        live = LiveSession([(ti.NiceInstrument(0.3), 1)], SR, BLOCK)
        assert live.key_event(0, "!", True) is None

    def test_default_key_pairing_without_caller_dict(self):
        """key_event with no note_ids uses the session's own per-part
        tracker: the key-up reuses the key-down's note id, so polyphonic
        dispatchers (which drop offs with unmatched ids) release the note.
        Regression: an unpaired off used to leave wire-driven notes stuck."""
        live = LiveSession([(ti.NiceInstrument(0.3), 3)], SR, BLOCK)
        nid_on = live.key_event(0, "z", True)
        blk1 = live.render_block()
        nid_off = live.key_event(0, "z", False)
        assert nid_off == nid_on
        blk2 = live.render_block()
        tail = live.render_blocks(20)
        assert np.abs(blk1).max() > 1e-4
        assert np.abs(tail[:, -BLOCK:]).max() < np.abs(blk2).max()
        # a key-up with no matching down is a no-op, not a fresh-id off
        assert live.key_event(0, "x", False) is None


class TestScriptLive:
    def test_script_instrument_in_live_session(self):
        # the script_runtime examples' interactive analog: a compiled DSL
        # module driven by keyboard events, block by block
        from zang_tpu.script import compile_script
        from zang_tpu.script.jax_backend import ScriptInstrument

        src = """
Synth = defmodule freq: cob, note_on: boolean, begin
    e = Envelope(attack=.cubed(0.02), decay=.cubed(0.1), release=.cubed(0.4),
                 sustain_volume=0.8, note_on)
    out PulseOsc(freq, color=0.4) * e
end
"""
        inst = ScriptInstrument(compile_script(src), "Synth")
        live = LiveSession([(inst, 2)], 44100.0, 1024)
        held = {}
        live.key_event(0, "z", True, note_ids=held)
        on = live.render_blocks(4)
        live.key_event(0, "z", False, note_ids=held)
        off = live.render_blocks(8)
        assert np.abs(on).max() > 1e-3
        assert np.isfinite(on).all() and np.isfinite(off).all()
        # release decays
        assert np.abs(off[:, -1024:]).max() < np.abs(on).max()


class TestLivePostFx:
    def test_stereo_echoes_post_chain(self):
        # example_delay.zig's interactive flow: keyboard voice -> StereoEchoes
        import jax.numpy as jnp

        from zang_tpu.ops import delay as d_ops

        def post_fn(state, mix, ctx):
            return d_ops.stereo_echoes(state, mix, 0.6, 0.7)

        live = LiveSession(
            [(ti.HardSquareInstrument(), 1)], SR, BLOCK,
            num_channels=2, post_fn=post_fn,
            post_init_state=lambda: d_ops.stereo_echoes_init(15000),
        )
        held = {}
        live.key_event(0, "z", True, note_ids=held)
        on = live.render_blocks(3)
        live.key_event(0, "z", False, note_ids=held)
        tail = live.render_blocks(18)
        assert on.shape[0] == 2
        assert not np.allclose(on[0], on[1])  # mirrored echoes
        # echo energy persists ~15000 frames after note-off
        assert np.abs(tail[:, 14 * BLOCK:15 * BLOCK]).max() > 1e-4


class TestLiveMultiPart:
    def test_two_instruments_mix(self):
        # example_play.zig's shape: keyboard voice + drone, two parts
        live = LiveSession(
            [(ti.PMOscInstrument(1.0), 1), (ti.FilteredSawtoothInstrument(), 1)],
            SR, BLOCK)
        live.push_event(0, {"freq": 440.0, "note_on": True})
        live.push_event(1, {"freq": 110.0, "note_on": True})
        both = live.render_blocks(4)
        assert np.isfinite(both).all() and np.abs(both).max() > 1e-3
        # the mix contains both fundamentals
        sp = np.abs(np.fft.rfft(both[0]))
        freqs = np.fft.rfftfreq(both.shape[1], 1.0 / SR)
        def peak_near(f0):
            band = (freqs > f0 * 0.9) & (freqs < f0 * 1.1)
            return sp[band].max()
        assert peak_near(440.0) > 0.01 * sp.max()
        assert peak_near(110.0) > 0.01 * sp.max()


class TestLiveThreading:
    def test_concurrent_pushes_while_rendering(self):
        # the reference host pushes key events from the main thread while
        # the audio callback renders (locked via SDL_LockAudioDevice);
        # LiveSession must tolerate the same pattern
        import threading

        live = LiveSession([(ti.NiceInstrument(0.3), 4)], SR, BLOCK)
        stop = threading.Event()
        errors = []

        def pusher():
            i = 0
            try:
                while not stop.is_set():
                    live.push_event(
                        0, {"freq": 220.0 + (i % 12) * 20.0,
                            "note_on": i % 2 == 0})
                    i += 1
            except Exception as e:  # pragma: no cover
                errors.append(e)

        t = threading.Thread(target=pusher)
        t.start()
        try:
            out = live.render_blocks(20)
        finally:
            stop.set()
            t.join()
        assert not errors
        assert np.isfinite(out).all()


class TestRecorderLoop:
    def test_record_then_loop_through_live_session(self):
        # the backquote record/replay flow (examples/recorder.zig +
        # example.zig:393-400) driven through the live host: record a
        # phrase, then loop it; the looped audio repeats the phrase
        from zang_tpu.host.interaction import Recorder

        live = LiveSession([(ti.NiceInstrument(0.3), 3)], SR, BLOCK)
        rec = Recorder()
        block_t = BLOCK / SR

        rec.start_recording(now=0.0)
        rec.record_event(0.0, key=ord("z"), down=True)
        rec.record_event(2 * block_t, key=ord("z"), down=False)
        rec.record_event(3 * block_t, key=ord("c"), down=True)
        rec.record_event(5 * block_t, key=ord("c"), down=False)
        rec.start_playing(now=0.0, loop_length=8 * block_t)

        held = {}
        blocks = []
        for b in range(24):  # three 8-block loop iterations
            for key, down in rec.poll(now=b * block_t):
                live.key_event(0, chr(key), down, note_ids=held)
            blocks.append(live.render_block())
        audio = np.concatenate(blocks, axis=1)
        assert np.isfinite(audio).all()
        loop = 8 * BLOCK
        first, second = audio[0, :loop], audio[0, loop:2 * loop]
        # the second iteration replays the phrase with the same notes at
        # the same relative frames, but oscillator phase runs continuously
        # across the session (the reference never resets counters), so
        # compare spectra rather than waveforms
        s1 = np.abs(np.fft.rfft(first))
        s2 = np.abs(np.fft.rfft(second))
        denom = np.linalg.norm(s1) * np.linalg.norm(s2)
        assert denom > 0
        # loops also carry the previous iteration's release tails, so the
        # match is strong but not exact
        assert float(s1 @ s2) / denom > 0.9
        r1 = np.sqrt((first ** 2).mean())
        r2 = np.sqrt((second ** 2).mean())
        assert 0.7 < r2 / r1 < 1.4


class TestSlotCapacityDegrade:
    def test_overflow_at_cap_drops_instead_of_crashing(self):
        import warnings

        # tiny capacity + cap, then a burst of events far denser than the
        # window can hold: the session must warn and keep rendering
        live = LiveSession([(ti.NiceInstrument(0.3), 2)], SR, BLOCK,
                           slot_capacity=2, max_slot_capacity=4)
        for i in range(16):
            f = 220.0 * 2 ** ((i % 12) / 12.0)
            nid = live.push_event(0, {"freq": f, "note_on": True},
                                  impulse_frame=i * 60)
            live.push_event(0, {"freq": f, "note_on": False}, note_id=nid,
                            impulse_frame=i * 60 + 30)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            out = live.render_block()
        assert np.isfinite(out).all()
        assert any("max_slot_capacity" in str(w.message) for w in caught)
        assert live.slot_capacity == 4  # grew to the cap, no further
        # subsequent sparse blocks render normally
        out2 = live.render_block()
        assert np.isfinite(out2).all()
