"""Sanity tests for the oracle engine (reference-exact semantics).

These check internal consistency and hand-derivable values; device-vs-oracle
parity tests live in test_parity_*.py.
"""

import numpy as np
import pytest

from zang_tpu.core.curves import PaintCurve
from zang_tpu.core.span import Span
from zang_tpu.oracle import modules as m
from zang_tpu.oracle import engine


def paint_once(module, n, params, note_id_changed=True, num_temps=0):
    out = np.zeros(n, dtype=np.float32)
    temps = [np.zeros(n, dtype=np.float32) for _ in range(num_temps)]
    module.paint(Span(0, n), [out], temps, note_id_changed, params)
    return out


class TestSineOsc:
    def test_exact_matches_numpy(self):
        osc = m.SineOsc("exact")
        out = paint_once(osc, 64, {"sample_rate": 44100.0, "freq": 440.0, "phase": 0.0})
        t = np.cumsum(
            np.concatenate([[np.float32(0.0)], np.full(63, np.float32(440.0 / 44100.0))]),
            dtype=np.float32,
        )
        expected = np.sin((t * np.float32(np.pi)) * np.float32(2.0), dtype=np.float32)
        np.testing.assert_allclose(out, expected, rtol=0, atol=2e-7)

    def test_phase_wraps_per_paint_call(self):
        osc = m.SineOsc("exact")
        paint_once(osc, 1024, {"sample_rate": 44100.0, "freq": 440.0, "phase": 0.0})
        assert 0.0 <= osc.t < 1.0

    def test_parity_close_to_exact(self):
        # exact mode (reference behavior) accumulates f32 rounding bias in its
        # phase (~1e-6 cycles/sample at this freq); fixed-point parity mode is
        # drift-free, so they diverge slowly. Over one 1024-sample block the
        # deviation stays small; this documents the expected scale.
        a = paint_once(m.SineOsc("exact"), 1024, {"sample_rate": 44100.0, "freq": 440.0, "phase": 0.0})
        b = paint_once(m.SineOsc("parity"), 1024, {"sample_rate": 44100.0, "freq": 440.0, "phase": 0.0})
        assert np.max(np.abs(a - b)) < 3e-3

    def test_adds_into_output(self):
        osc = m.SineOsc("exact")
        out = np.full(16, np.float32(5.0))
        osc.paint(Span(0, 16), [out], [], True, {"sample_rate": 44100.0, "freq": 0.0, "phase": 0.25})
        np.testing.assert_allclose(out, 6.0, atol=1e-6)  # sin(pi/2)=1 added


class TestPulseOsc:
    def test_square_values(self):
        osc = m.PulseOsc()
        out = paint_once(osc, 1024, {"sample_rate": 44100.0, "freq": 441.0, "color": 0.5})
        # anti-aliased square: nearly all samples at +-0.7
        frac_at_rails = np.mean(np.isclose(np.abs(out), 0.7, atol=1e-5))
        assert frac_at_rails > 0.9
        assert np.max(out) <= 0.7 + 1e-5
        assert abs(np.mean(out)) < 0.02

    def test_silent_above_sr_over_8(self):
        osc = m.PulseOsc()
        out = paint_once(osc, 64, {"sample_rate": 44100.0, "freq": 6000.0, "color": 0.5})
        assert np.all(out == 0.0)

    def test_controlled_freq_advances_phase(self):
        osc = m.PulseOsc()
        freq = np.full(2048, np.float32(441.0))
        out = paint_once(osc, 2048, {"sample_rate": 44100.0, "freq": freq, "color": 0.5})
        assert osc.cnt != 0
        assert np.any(out > 0.5) and np.any(out < -0.5)


class TestTriSawOsc:
    def test_saw_shape(self):
        osc = m.TriSawOsc()
        out = paint_once(osc, 2048, {"sample_rate": 44100.0, "freq": 441.0, "color": 0.0})
        assert np.max(out) <= 0.7 + 1e-4
        assert np.min(out) >= -0.7 - 1e-4
        assert np.std(out) > 0.2


class TestEnvelope:
    SR = 1000.0

    def params(self, note_on, sustain=0.5):
        return {
            "sample_rate": self.SR,
            "attack": PaintCurve.linear(0.01),  # 10 samples
            "decay": PaintCurve.linear(0.01),
            "release": PaintCurve.linear(0.02),  # 20 samples
            "sustain_volume": sustain,
            "note_on": note_on,
        }

    def test_adsr_shape(self):
        env = m.Envelope()
        out = paint_once(env, 100, self.params(True))
        # attack: 10 samples ramp to 1.0
        np.testing.assert_allclose(out[9], 1.0, atol=1e-6)
        assert np.all(np.diff(out[:10]) > 0)
        # decay to 0.5 over 10 samples, then sustain
        np.testing.assert_allclose(out[19], 0.5, atol=1e-6)
        np.testing.assert_allclose(out[20:], 0.5, atol=1e-6)
        assert env.state == m.Envelope.SUSTAIN
        # release
        out2 = paint_once(env, 100, self.params(False), note_id_changed=False)
        np.testing.assert_allclose(out2[19], 0.0, atol=1e-6)
        np.testing.assert_allclose(out2[20:], 0.0, atol=1e-6)
        assert env.state == m.Envelope.IDLE

    def test_sustain_one_skips_decay(self):
        env = m.Envelope()
        out = paint_once(env, 50, self.params(True, sustain=1.0))
        np.testing.assert_allclose(out[10:], 1.0, atol=1e-6)

    def test_retrigger_mid_release_starts_from_current_value(self):
        env = m.Envelope()
        paint_once(env, 20, self.params(True))  # through attack+decay
        out_rel = paint_once(env, 10, self.params(False), note_id_changed=False)
        val = out_rel[-1]
        assert 0.0 < val < 0.5
        out_att = paint_once(env, 10, self.params(True), note_id_changed=True)
        # attack restarts from current value, ramping toward 1.0
        assert out_att[0] > val
        assert np.all(np.diff(out_att) > 0)

    def test_instantaneous_attack(self):
        env = m.Envelope()
        p = self.params(True)
        p["attack"] = PaintCurve.instantaneous()
        out = paint_once(env, 30, p)
        # jumps straight into decay from 1.0
        assert out[0] < 1.0 and out[0] > 0.5
        np.testing.assert_allclose(out[10:], 0.5, atol=1e-6)


class TestFilter:
    def test_lowpass_dc_passthrough(self):
        flt = m.Filter()
        inp = np.ones(4096, dtype=np.float32)
        out = np.zeros(4096, dtype=np.float32)
        flt.paint(Span(0, 4096), [out], [], True, {
            "input": inp, "type": "low_pass",
            "cutoff": m.cutoff_from_frequency(1000.0, 44100.0), "res": 0.0,
        })
        np.testing.assert_allclose(out[-100:], 1.0, atol=1e-3)

    def test_highpass_blocks_dc(self):
        flt = m.Filter()
        inp = np.ones(4096, dtype=np.float32)
        out = np.zeros(4096, dtype=np.float32)
        flt.paint(Span(0, 4096), [out], [], True, {
            "input": inp, "type": "high_pass",
            "cutoff": m.cutoff_from_frequency(1000.0, 44100.0), "res": 0.0,
        })
        assert abs(out[-1]) < 1e-3

    def test_bypass(self):
        flt = m.Filter()
        inp = np.random.default_rng(0).standard_normal(100).astype(np.float32)
        out = np.zeros(100, dtype=np.float32)
        flt.paint(Span(0, 100), [out], [], True, {
            "input": inp, "type": "bypass", "cutoff": 0.5, "res": 0.0,
        })
        np.testing.assert_array_equal(out, inp)


class TestGatePortamento:
    def test_gate(self):
        g = m.Gate()
        out = paint_once(g, 8, {"note_on": True})
        np.testing.assert_array_equal(out, 1.0)
        out = paint_once(g, 8, {"note_on": False})
        np.testing.assert_array_equal(out, 0.0)

    def test_portamento_glides(self):
        p = m.Portamento()
        params = {
            "sample_rate": 1000.0,
            "curve": PaintCurve.linear(0.01),
            "goal": 100.0,
            "note_on": True,
            "prev_note_on": False,
        }
        out = paint_once(p, 20, params)  # first note: instantaneous
        np.testing.assert_allclose(out, 100.0, atol=1e-4)
        params2 = dict(params, goal=200.0, prev_note_on=True)
        out2 = paint_once(p, 20, params2)  # glide 10 samples to 200
        assert out2[0] < 200.0
        np.testing.assert_allclose(out2[10:], 200.0, atol=1e-3)


class TestDecimatorDistortion:
    def test_decimator_holds(self):
        d = m.Decimator()
        inp = np.arange(100, dtype=np.float32)
        out = np.zeros(100, dtype=np.float32)
        d.paint(Span(0, 100), [out], [], True, {
            "sample_rate": 100.0, "input": inp, "fake_sample_rate": 25.0,
        })
        # holds each taken value for 4 samples
        assert len(np.unique(out)) == pytest.approx(25, abs=2)

    def test_distortion_clip(self):
        dist = m.Distortion()
        inp = np.linspace(-2, 2, 101, dtype=np.float32)
        out = np.zeros(101, dtype=np.float32)
        dist.paint(Span(0, 101), [out], [], True, {
            "input": inp, "type": "clip", "ingain": 0.25, "outgain": 1.0, "offset": 0.0,
        })
        assert np.max(out) <= 1.0 and np.min(out) >= -1.0


class TestDelay:
    def test_simple_delay_shifts(self):
        from zang_tpu.oracle.instruments import SimpleDelay

        sd = SimpleDelay(10)
        inp = np.arange(1, 33, dtype=np.float32)
        out = np.zeros(32, dtype=np.float32)
        sd.paint(Span(0, 32), [out], [], True, {"input": inp})
        np.testing.assert_array_equal(out[:10], 0.0)
        np.testing.assert_array_equal(out[10:], inp[:22])

    def test_delay_chunking_across_spans(self):
        from zang_tpu.oracle.instruments import SimpleDelay

        sd = SimpleDelay(7)
        inp = np.arange(1, 65, dtype=np.float32)
        out = np.zeros(64, dtype=np.float32)
        # paint in two uneven spans
        sd.paint(Span(0, 30), [out], [], True, {"input": inp})
        sd.paint(Span(30, 64), [out], [], False, {"input": inp})
        np.testing.assert_array_equal(out[:7], 0.0)
        np.testing.assert_array_equal(out[7:], inp[:57])


class TestEngine:
    def test_render_blocks_envelope_voice(self):
        from zang_tpu.core.notes import SongEvent

        song = [
            SongEvent({"freq": 440.0, "note_on": True}, t=0.0, note_id=1),
            SongEvent({"freq": 440.0, "note_on": False}, t=0.5, note_id=1),
        ]

        def make_module():
            return m.Envelope()

        def make_params(sr, src):
            return {
                "sample_rate": sr,
                "attack": PaintCurve.linear(0.1),
                "decay": PaintCurve.linear(0.1),
                "release": PaintCurve.linear(0.1),
                "sustain_volume": 0.5,
                "note_on": src["note_on"],
            }

        voice = engine.Voice(song, 1, make_module, make_params)
        mix = engine.render_blocks(
            lambda span, outs, temps: voice.paint(span, 1000.0, outs, temps),
            total_frames=1000,
            block_size=256,
        )
        env = mix[0]
        assert env[99] == pytest.approx(1.0, abs=1e-5)  # attack done at 0.1s
        assert env[450] == pytest.approx(0.5, abs=1e-5)  # sustain
        assert env[700] == pytest.approx(0.0, abs=1e-5)  # released
