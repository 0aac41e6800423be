"""Every ported example must render finite, non-silent audio, plus a few
semantic spot checks (the reference's examples double as feature acceptance
tests — SURVEY.md §4)."""

import numpy as np
import pytest

from zang_tpu.host.examples import EXAMPLES


@pytest.mark.parametrize("name", sorted(EXAMPLES))
def test_example_renders(name):
    audio, sr = EXAMPLES[name](seconds=2.0)
    a = np.asarray(audio)
    assert a.ndim == 2 and a.shape[1] == int(2.0 * sr)
    assert np.isfinite(a).all()
    assert np.abs(a).max() > 1e-4, "silent render"


class TestSemantics:
    def test_stereo_channels_differ(self):
        a, _ = EXAMPLES["stereo"](seconds=2.0)
        a = np.asarray(a)
        assert a.shape[0] == 2
        assert not np.allclose(a[0], a[1])

    def test_vibrato_modulates_frequency(self):
        a, sr = EXAMPLES["vibrato"](seconds=2.0)
        x = np.asarray(a)[0]
        # count zero crossings per eighth-second window — half the 4 Hz
        # vibrato period, so alternate windows sit on opposite swings
        zc = []
        w = int(0.125 * sr)
        for i in range(2, 12):
            seg = x[i * w:(i + 1) * w]
            zc.append(int(np.sum(np.diff(np.signbit(seg)) != 0)))
        assert max(zc) > min(zc)

    def test_arpeggiator_cycles(self):
        a, sr = EXAMPLES["arpeggiator"](seconds=1.0)
        x = np.asarray(a)[0]
        # notes change every 30ms: adjacent windows differ in pitch
        w = int(0.03 * sr)
        f = []
        for i in range(4, 10):
            seg = x[i * w:(i + 1) * w]
            sp = np.abs(np.fft.rfft(seg))
            f.append(np.argmax(sp))
        assert len(set(f)) > 1

    def test_portamento_glides(self):
        a, sr = EXAMPLES["portamento"](seconds=2.0)
        x = np.asarray(a)[0]
        # zero-crossing rate should change smoothly between the notes
        w = int(0.1 * sr)
        rates = [np.sum(np.diff(np.signbit(x[i * w:(i + 1) * w])) != 0)
                 for i in range(3, 14)]
        assert max(rates) > min(rates) + 5

    def test_delay_echo_is_stereo_and_repeats(self):
        a, sr = EXAMPLES["delay"](seconds=4.0)
        a = np.asarray(a)
        assert a.shape[0] == 2
        # left = dry + echoed, right = dry + mirrored: channels differ
        assert not np.allclose(a[0], a[1])
        # energy persists after the last note-off (echo tail)
        tail = a[:, int(3.5 * sr):]
        assert np.abs(tail).max() > 1e-3

    def test_script_runtime_reload_changes_timbre(self):
        a, sr = EXAMPLES["script_runtime"](seconds=4.0)
        x = np.asarray(a)[0]
        half = x.shape[0] // 2
        s0 = np.abs(np.fft.rfft(x[:half]))
        s1 = np.abs(np.fft.rfft(x[half:]))
        # the reloaded script (color 0.3 -> 0.5) shifts the spectrum
        assert np.corrcoef(s0, s1)[0, 1] < 0.995

    def test_fmsynth_feedback_changes_timbre(self):
        from zang_tpu.host.examples import FMSynthInstrument, _render_parts, _simple_song
        from zang_tpu.core.timeline import compile_timelines
        from zang_tpu.core import twelve_tet as tt

        sr = 48000.0
        song = _simple_song([(0.05, 1.0, 440.0)])
        total = int(1.5 * sr)
        outs = []
        for fb in (0, 5):
            tls = compile_timelines(song, 1, sr, total)
            inst = FMSynthInstrument(mod_feedback=fb)
            (audio, _) = _render_parts([(inst, tls)], 1.5, sr)
            outs.append(np.asarray(audio)[0])
        # feedback adds harmonics: spectra differ substantially
        s0 = np.abs(np.fft.rfft(outs[0][:32768]))
        s1 = np.abs(np.fft.rfft(outs[1][:32768]))
        corr = np.corrcoef(s0, s1)[0, 1]
        assert corr < 0.97
