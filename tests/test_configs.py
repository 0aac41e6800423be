"""End-to-end golden tests for the sampler and poly_echo configs."""

import numpy as np
import pytest

from zang_tpu.core.span import Span
from zang_tpu.core.wav import read_wav
from zang_tpu.graph.fidelity import deviation_dbfs
from zang_tpu.graph.render import render_performance
from zang_tpu.host import configs
from zang_tpu.oracle import engine as oe
from zang_tpu.oracle import instruments as oi
from zang_tpu.oracle.modules import (
    Decimator as ODec,
    Distortion as ODist,
    Sample,
    Sampler as OSampler,
)

SR = 44100.0


class TestSamplerConfig:
    def test_golden_chain(self):
        perf, total = configs.build_sampler_performance(
            seconds=3.0, fake_sample_rate=6000.0
        )
        mix = render_performance(perf, total, chunk_size=16384)[0]

        w = read_wav(configs.DRUMLOOP)
        osample = Sample(w.num_channels, w.sample_rate, "signed16_lsb", w.data)
        osam, odist, odec = OSampler(mode="parity"), ODist(), ODec(mode="parity")
        a = np.zeros(total, dtype=np.float32)
        t0 = np.zeros(total, dtype=np.float32)
        t1 = np.zeros(total, dtype=np.float32)
        for s in range(0, total, 1024):
            e = min(total, s + 1024)
            sp = Span(s, e)
            osam.paint(sp, [t0], [], s == 0, {
                "sample_rate": SR, "sample": osample, "channel": 0, "loop": True,
            })
            t0[s:e] *= np.float32(2.5)
            odist.paint(sp, [t1], [], False, {
                "input": t0, "type": "overdrive",
                "ingain": 0.9, "outgain": 0.5, "offset": 0.0,
            })
            odec.paint(sp, [a], [], False, {
                "sample_rate": SR, "input": t1, "fake_sample_rate": 6000.0,
            })
        dev = deviation_dbfs(a, mix)
        print(f"\nsampler chain: rms {dev[0]:.1f} dBFS, peak {dev[1]:.1f} dBFS")
        assert dev[0] < -110.0, dev


class TestPolyEchoConfig:
    def test_golden_small(self):
        nv, seconds = 4, 3.0
        perf, total = configs.build_poly_echo_performance(
            num_voices=nv, seconds=seconds, main_delay=3000, seed=7
        )
        stereo = render_performance(perf, total, chunk_size=16384)

        # oracle twin: per-voice NiceInstrument + StereoEchoes post chain
        songs = configs.make_texture_song(nv, seconds, seed=7)
        voices = [
            oe.Voice(song, 1, lambda: oi.NiceInstrument(0.3, mode="parity"),
                     lambda sr, p: {"sample_rate": sr, "freq": p["freq"],
                                    "note_on": p["note_on"]})
            for song in songs
        ]
        echo = oi.StereoEchoes(3000, mode="parity")
        mixbuf = np.zeros(1024, dtype=np.float32)

        def paint(span, outputs, temps):
            mixbuf[span.start:span.end] = 0.0
            for v in voices:
                v.paint(span, SR, [mixbuf], temps[:2])
            mixbuf[span.start:span.end] *= np.float32(1.0 / nv)
            echo.paint(span, outputs, temps, False, {
                "input": mixbuf, "feedback_volume": 0.6, "cutoff": 0.7,
            })

        a = oe.render_blocks(paint, total, num_outputs=2, num_temps=4)
        dev = deviation_dbfs(a, stereo)
        print(f"\npoly_echo: rms {dev[0]:.1f} dBFS, peak {dev[1]:.1f} dBFS")
        assert dev[0] < -90.0, dev


class TestSamplerReverse:
    def test_reverse_playback_bit_exact(self):
        # negative speed = reverse looped playback (Sampler.zig:99-102);
        # the oracle twin gets the same negated nominal rate
        perf, total = configs.build_sampler_performance(
            seconds=3.0, speed=-1.0, distort=False, fake_sample_rate=None)
        mix = render_performance(perf, total, chunk_size=16384)[0]

        w = read_wav(configs.DRUMLOOP)
        osample = Sample(w.num_channels, -w.sample_rate, "signed16_lsb", w.data)
        osam = OSampler(mode="parity")
        a = np.zeros(total, dtype=np.float32)
        for s in range(0, total, 1024):
            e = min(total, s + 1024)
            osam.paint(Span(s, e), [a], [], s == 0, {
                "sample_rate": SR, "sample": osample, "channel": 0,
                "loop": True,
            })
        a *= np.float32(2.5)
        dev = deviation_dbfs(a, np.asarray(mix))
        assert dev[0] < -150.0, dev
        # sanity: it actually plays (non-silent) and differs from forward
        fwd, _ = configs.build_sampler_performance(
            seconds=3.0, speed=1.0, distort=False, fake_sample_rate=None)
        fmix = render_performance(fwd, total, chunk_size=16384)[0]
        assert np.abs(np.asarray(mix)).max() > 0.1
        assert not np.allclose(np.asarray(mix), np.asarray(fmix))


class TestSamplerOneShot:
    def test_non_looped_plays_once_bit_exact(self):
        from zang_tpu.core.notes import SongEvent
        from zang_tpu.core.timeline import compile_timelines
        from zang_tpu.graph.render import Performance

        w = read_wav(configs.DRUMLOOP)
        loop_secs = len(w.data) / 2 / w.sample_rate
        total = int(3.0 * SR)
        inst = configs.SamplerInstrument(
            loop=False, distort=False, fake_sample_rate=None)
        song = [SongEvent({"note_on": True}, t=0.0, note_id=1)]
        tls = compile_timelines(song, 1, SR, total)
        mix = render_performance(
            Performance([(inst, tls)], SR), total, chunk_size=16384)[0]

        osample = Sample(w.num_channels, w.sample_rate, "signed16_lsb", w.data)
        osam = OSampler(mode="parity")
        a = np.zeros(total, dtype=np.float32)
        for s in range(0, total, 1024):
            e = min(total, s + 1024)
            osam.paint(Span(s, e), [a], [], s == 0, {
                "sample_rate": SR, "sample": osample, "channel": 0,
                "loop": False,
            })
        a *= np.float32(2.5)
        dev = deviation_dbfs(a, np.asarray(mix))
        assert dev[0] < -150.0, dev
        # exact silence once the (non-looped) sample is exhausted
        tail = np.asarray(mix)[int((loop_secs + 0.2) * SR):]
        assert np.abs(tail).max() == 0.0
