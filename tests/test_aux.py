"""Aux subsystems: visualizer data, recorder, parameters, reload watcher."""

import os
import socket
import time

import numpy as np
import pytest

from zang_tpu.host.visual import (
    Visuals, fft_radix2, oscilloscope_frame, spectrum_frame, waveform_frame,
)
from zang_tpu.host.interaction import (
    MAX_RECORDER_NOTES, Parameter, Recorder, ReloadWatcher,
)


class TestFFT:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(512)
        re, im = x.copy(), np.zeros(512)
        fft_radix2(re, im)
        ref = np.fft.fft(x)
        np.testing.assert_allclose(re, ref.real, atol=1e-9)
        np.testing.assert_allclose(im, ref.imag, atol=1e-9)

    def test_spectrum_peak_at_tone(self):
        sr = 48000.0
        n = 512
        f = sr / n * 32  # exactly bin 32
        x = np.sin(2 * np.pi * f * np.arange(n) / sr)
        mag = spectrum_frame(x, n, log_scale=False)
        assert np.argmax(mag) == 32


class TestVisualFrames:
    def test_waveform_envelope(self):
        x = np.linspace(-1, 1, 1024).astype(np.float32)
        w = waveform_frame(x, width=64)
        assert w.shape == (64, 2)
        assert np.all(w[:, 0] <= w[:, 1])
        assert w[0, 0] == pytest.approx(-1.0, abs=1e-3)
        assert w[-1, 1] == pytest.approx(1.0, abs=1e-3)

    def test_oscilloscope_sync(self):
        sr = 48000.0
        f = 440.0
        x = np.sin(2 * np.pi * f * np.arange(2048) / sr).astype(np.float32)
        frame = oscilloscope_frame(x, f, sr, width=128)
        assert frame.shape == (128,)
        # one synced period: starts near zero going up, ends near zero
        assert abs(frame[0]) < 0.1
        assert frame[5] > frame[0]

    def test_streaming_frames(self):
        sr = 48000.0
        audio = np.sin(2 * np.pi * 440 * np.arange(4096) / sr).astype(np.float32)
        frames = list(Visuals(sr).frames(audio))
        assert len(frames) == 4
        assert all("spectrum" in f and "waveform" in f for f in frames)


class TestVisualRender:
    """The offline rendering layer (visual.zig's widget/UI analog)."""

    def _tone_wav(self, path, sr=44100, f=440.0, seconds=0.5):
        from zang_tpu.core.wav import write_wav_s16

        t = np.arange(int(sr * seconds))
        x = (0.5 * np.sin(2 * np.pi * f * t / sr) * 32767).astype(np.int16)
        write_wav_s16(str(path), x, sr)

    def test_render_image(self):
        from zang_tpu.host.visual import render_image

        sr = 44100.0
        x = 0.5 * np.sin(2 * np.pi * 440 * np.arange(44100) / sr)
        img = render_image(x.astype(np.float32), sr, width=512, title="tone")
        assert img.dtype == np.uint8 and img.shape[1] == 512
        # every panel drew something: not all background
        assert (img != img[0, 0]).any(axis=-1).mean() > 0.05

    def test_cli_writes_valid_png(self, tmp_path):
        import struct

        from zang_tpu.host.visual import main

        wav = tmp_path / "tone.wav"
        self._tone_wav(wav)
        out = tmp_path / "tone.png"
        assert main([str(wav), str(out)]) == 0
        d = out.read_bytes()
        assert d[:8] == b"\x89PNG\r\n\x1a\n"
        w, h = struct.unpack(">II", d[16:24])
        assert w == 1024 and h > 400

    def test_font_coverage(self):
        from zang_tpu.host.visual import _FONT, draw_text

        img = np.zeros((12, 400, 3), np.uint8)
        draw_text(img, 1, 1, "SPECTRUM 0.5S -96.9 DBFS 440HZ", (255, 255, 255))
        assert img.any()
        assert all(len(rows) == 7 for rows in _FONT.values())


class TestParameter:
    def test_step_clamps(self):
        p = Parameter("x", num_values=4, current_value=2)
        assert p.step(+5) == 3
        assert p.step(-10) == 0

    def test_randomize_favor_low(self):
        rng = np.random.default_rng(0)
        lo = Parameter("x", num_values=64, favor_low_values=True)
        hi = Parameter("x", num_values=64)
        lows = [lo.randomize(rng) for _ in range(200)]
        his = [hi.randomize(rng) for _ in range(200)]
        assert np.mean(lows) < np.mean(his)


class TestRecorder:
    def test_record_and_loop(self):
        r = Recorder()
        r.start_recording(10.0)
        r.record_event(10.0, key=5, down=True)
        r.record_event(10.5, key=5, down=False)
        r.start_playing(20.0, loop_length=1.0)
        assert r.poll(20.0) == [(5, True)]
        assert r.poll(20.5) == [(5, False)]
        # loops
        assert r.poll(21.05) == [(5, True)]

    def test_capacity(self):
        r = Recorder()
        r.start_recording(0.0)
        for i in range(MAX_RECORDER_NOTES + 10):
            r.record_event(i * 0.001, key=1, down=True)
        assert len(r.events) == MAX_RECORDER_NOTES

    def test_cycle_mode_and_held_key_drain(self):
        # recorder.zig cycleMode + getNote:107-144: one key cycles
        # idle -> recording -> playing(loop) -> idle, and every
        # transition/loop seam first drains held keys as up-events
        r = Recorder()
        r.cycle_mode()
        assert r.poll(0.0) == [] and r.state == "recording"
        r.record_event(0.1, key=5, down=True)
        r.track_event(5, True)
        r.record_event(0.3, key=5, down=False)
        r.track_event(5, False)
        r.record_event(0.5, key=7, down=True)
        r.track_event(7, True)
        r.cycle_mode()  # recording -> playing; key 7 is still held
        out = r.poll(1.0)
        assert out == [(7, False)]  # drained BEFORE playback starts
        assert r.state == "playing" and r.loop_seconds == 1.0
        assert r.poll(1.1) == [(5, True)]
        r.track_event(5, True)
        assert r.poll(1.3) == [(5, False)]
        r.track_event(5, False)
        assert r.poll(1.5) == [(7, True)]
        r.track_event(7, True)
        # loop seam at t=1.0: the restart arms the drain; nothing is due
        # yet under the NEW loop clock so this call emits nothing, and the
        # pump's NEXT call pops the held 7. (The reference would emit
        # notes[0] right here via its stale pre-restart time check and the
        # drain would then cut that note — a documented deliberate
        # divergence, see Recorder._get_note.)
        assert r.poll(2.0) == []
        assert r.poll(2.0) == [(7, False)]
        assert r.poll(2.1) == [(5, True)]
        r.track_event(5, True)
        # third cycle press: drain, then off
        r.cycle_mode()
        assert r.poll(2.2) == [(5, False)]
        assert r.state == "idle"
        assert r.poll(2.3) == []


class TestReloadWatcher:
    def test_file_watch_and_udp(self, tmp_path):
        from zang_tpu.script.runtime import LiveScript

        script = tmp_path / "live.txt"
        script.write_text(
            "M = defmodule freq: cob, note_on: boolean, begin out SineOsc(freq, phase=0) end")
        ls = LiveScript(str(script), "M")
        watcher = ReloadWatcher(ls, udp_port=0)
        # file change triggers reload
        script.write_text(script.read_text() + "\n// changed\n")
        os.utime(script, (time.time() + 5, time.time() + 5))
        assert watcher.poll() is True
        # UDP reload message
        watcher.udp_port = _free_port()
        watcher.start_udp()
        before = watcher.reload_count
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        sock.sendto(b"reload", ("127.0.0.1", watcher.udp_port))
        deadline = time.time() + 3.0
        while watcher.reload_count == before and time.time() < deadline:
            time.sleep(0.05)
        watcher.close()
        sock.close()
        assert watcher.reload_count == before + 1


def _free_port():
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port
