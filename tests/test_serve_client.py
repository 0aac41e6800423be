"""Terminal player client (serve/client.py): the reference host's
keyboard-play loop as a TCP client — presses in, audio/VU/WAV out.
Non-realtime server; waits are on delivered-block counts, not wall time."""

import io
import sys
import time

import numpy as np
import pytest

from zang_tpu.core.wav import read_wav_f32
from zang_tpu.host import instruments as ti
from zang_tpu.serve.client import TerminalPlayer, main
from zang_tpu.serve.server import LiveClient, LiveServer

SR = 48000.0
BLOCK = 1024


def make_server(**kw):
    kw.setdefault("initial_lanes", 1)
    kw.setdefault("realtime", False)
    kw.setdefault("block_size", BLOCK)
    return LiveServer(lambda: [(ti.NiceInstrument(0.3), 2)], SR,
                      port=0, **kw)


def wait_blocks(player, n, timeout=60.0):
    """Block until the player has received n more blocks."""
    target = player.blocks_received + n
    deadline = time.monotonic() + timeout
    while player.blocks_received < target:
        assert time.monotonic() < deadline, "no blocks flowing"
        time.sleep(0.01)


class TestTerminalPlayer:
    def test_press_streams_audio_and_wav(self, tmp_path):
        wav = tmp_path / "take.wav"
        with make_server() as srv:
            c = LiveClient(srv.host, srv.port)
            with TerminalPlayer(c, gate=0.25, wav_path=str(wav),
                                quiet=True) as player:
                player.press("q")
                wait_blocks(player, 12)
                assert player.level > 0.01  # VU sees the note
                player.release("q")
                wait_blocks(player, 40)  # release tail decays
        audio, sr = read_wav_f32(str(wav))
        assert sr == int(SR)
        peak = np.abs(audio).max()
        assert peak > 0.05, peak
        tail = np.abs(audio[0, -BLOCK:]).max()
        assert tail < peak / 4, (tail, peak)

    def test_retrigger_and_auto_release(self):
        with make_server() as srv:
            c = LiveClient(srv.host, srv.port)
            with TerminalPlayer(c, gate=0.1, quiet=True) as player:
                player.press("z")
                player.press("z")  # retrigger while held: off + on
                time.sleep(0.3)  # gate timer fires the auto-release
                assert "z" not in player._timers
                wait_blocks(player, 5)

    def test_record_toggle_roundtrip(self, tmp_path):
        with make_server(record_dir=str(tmp_path)) as srv:
            c = LiveClient(srv.host, srv.port)
            with TerminalPlayer(c, quiet=True) as player:
                player.press("q")
                wait_blocks(player, 2)  # past the first-block jit compile
                player.toggle_recording()
                deadline = time.monotonic() + 60
                while player.recording_file is None:
                    assert time.monotonic() < deadline
                    time.sleep(0.01)
                fname = player.recording_file
                wait_blocks(player, 10)
                player.toggle_recording()
                deadline = time.monotonic() + 60
                while player.recording_file is not None:
                    assert time.monotonic() < deadline
                    time.sleep(0.01)
                audio, _sr = read_wav_f32(str(tmp_path / fname))
                assert np.abs(audio).max() > 0.05

    def test_stats_request(self):
        with make_server() as srv:
            c = LiveClient(srv.host, srv.port)
            with TerminalPlayer(c, quiet=True) as player:
                wait_blocks(player, 3)
                player.request_stats()
                deadline = time.monotonic() + 30
                while player.last_stats is None:
                    assert time.monotonic() < deadline
                    time.sleep(0.01)
                assert player.last_stats["clients"] == 1
                assert player.last_stats["block_time_ms"] > 0


class TestAutoResume:
    def test_stream_continues_after_blip(self):
        """Killing the socket mid-stream triggers reconnect+resume on the
        reader thread; the block stream continues on the new connection."""
        with make_server() as srv:
            c = LiveClient(srv.host, srv.port)
            with TerminalPlayer(c, quiet=True,
                                auto_resume=(srv.host, srv.port)) as player:
                player.press("q")
                wait_blocks(player, 6)
                player.client.sock.close()  # simulated network blip
                deadline = time.monotonic() + 60
                while player.resumes == 0:
                    assert time.monotonic() < deadline, "never resumed"
                    assert not player._stop.is_set(), "player gave up"
                    time.sleep(0.05)
                wait_blocks(player, 10)  # flowing again
                player.press("z")  # input path works on the new connection
                wait_blocks(player, 5)


class TestPipeModeCLI:
    def test_main_pipe_mode(self, tmp_path, monkeypatch):
        """main() with non-tty stdin: one key per line, then quit; the
        captured WAV is audible."""
        wav = tmp_path / "pipe.wav"
        with make_server() as srv:
            monkeypatch.setattr(sys, "stdin", io.StringIO("q\nz\n\n"))
            rc = main(["--host", srv.host, "--port", str(srv.port),
                       "--gate", "0.15", "--wav", str(wav)])
        assert rc == 0
        audio, _sr = read_wav_f32(str(wav))
        assert np.abs(audio).max() > 0.05


class TestLiveVisual:
    """The one-line live visual modes (reference F1-F6 visualizer,
    examples/visual.zig:943-1231): pure rendering, no server needed."""

    @staticmethod
    def _stub(mode):
        from types import SimpleNamespace

        return SimpleNamespace(
            visual_mode=mode,
            _full_scale=32767.0,
            recording_file=None,
            client=SimpleNamespace(welcome={"sample_rate": 48000.0}),
            _spark=TerminalPlayer._spark,
            _VISUAL_MODES=TerminalPlayer._VISUAL_MODES,
        )

    @staticmethod
    def _render(mode, block):
        import contextlib

        stub = TestLiveVisual._stub(mode)
        err = io.StringIO()
        with contextlib.redirect_stderr(err):
            TerminalPlayer._print_visual(stub, block)
        return err.getvalue()

    def test_spark_quantization(self):
        s = TerminalPlayer._spark(np.array([0.0, 0.5, 1.0]))
        assert len(s) == 3
        assert s[0] == " " and s[2] == "█"

    def test_modes_render_one_line(self):
        t = np.arange(1024, dtype=np.float32) / 48000.0
        sine = (np.sin(2 * np.pi * 440.0 * t) * 20000).astype(np.int16)
        block = sine[None, :]
        for mode, label in (("wave", "wav"), ("spec", "fft"),
                            ("scope", "osc")):
            out = TestLiveVisual._render(mode, block)
            assert out.startswith("\r" + label + "["), (mode, out[:20])
            assert "\n" not in out
            # a loud sine must light up the display
            assert any(c in out for c in "▅▆▇█"), (mode, out)

    def test_silence_stays_dark(self):
        block = np.zeros((1, 1024), np.int16)
        for mode in ("wave", "spec"):
            out = TestLiveVisual._render(mode, block)
            assert not any(c in out for c in "▁▂▃▄▅▆▇█"), (mode, out)

    def test_cycle_visual_order(self):
        stub = TestLiveVisual._stub(None)
        stub._note = lambda *a, **k: None
        seen = []
        for _ in range(5):
            TerminalPlayer.cycle_visual(stub)
            seen.append(stub.visual_mode)
        assert seen == ["wave", "spec", "scope", None, "wave"]
