"""HTTP render tier (serve/http.py): menu, WAV rendering, script uploads,
caching/single-flight, and request validation."""

import json
import struct
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from zang_tpu.serve.http import RenderHTTPServer

TEST_SCRIPT = """
TestSynth = defmodule freq: cob, note_on: boolean, begin
    e = Envelope(attack=.cubed(0.01), decay=.cubed(0.05), release=.cubed(0.1),
                 sustain_volume=0.8, note_on)
    out SineOsc(freq, phase=0) * e * 0.5
end
"""


def _get(srv, path, timeout=300.0):
    return urllib.request.urlopen(
        f"http://{srv.host}:{srv.port}{path}", timeout=timeout)


def _post(srv, path, body, timeout=300.0):
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


def _parse_wav(data: bytes):
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE", data[:12]
    sr = struct.unpack_from("<I", data, 24)[0]
    ch = struct.unpack_from("<H", data, 22)[0]
    n = struct.unpack_from("<I", data, 40)[0]
    pcm = np.frombuffer(data[44:44 + n], dtype=np.int16)
    return sr, ch, pcm


@pytest.fixture(scope="module")
def srv():
    with RenderHTTPServer(max_seconds=5.0) as s:
        yield s


class TestMenuAndValidation:
    def test_menu(self, srv):
        with _get(srv, "/v1/examples", timeout=10.0) as r:
            menu = json.loads(r.read())
        assert "envelope" in menu["examples"]
        assert "song" in menu["examples"]
        assert "/v1/render/script" in menu["endpoints"]

    def test_unknown_example_404(self, srv):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(srv, "/v1/render?example=nope", timeout=10.0)
        assert ei.value.code == 404

    def test_missing_example_400(self, srv):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(srv, "/v1/render", timeout=10.0)
        assert ei.value.code == 400

    def test_seconds_over_cap_400(self, srv):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(srv, "/v1/render?example=envelope&seconds=3600", timeout=10.0)
        assert ei.value.code == 400

    def test_unknown_endpoint_404(self, srv):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(srv, "/v1/nope", timeout=10.0)
        assert ei.value.code == 404

    def test_script_body_must_be_json(self, srv):
        req = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/v1/render/script",
            data=b"not json")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10.0)
        assert ei.value.code == 400


class TestRendering:
    def test_example_render_and_cache(self, srv):
        before = srv.stats()
        with _get(srv, "/v1/render?example=envelope&seconds=1.0") as r:
            assert r.headers["Content-Type"] == "audio/wav"
            wav1 = r.read()
        sr, ch, pcm = _parse_wav(wav1)
        assert ch == 1 and len(pcm) == int(sr * 1.0)
        assert np.abs(pcm).max() > 100  # audible, not silence
        # identical request: served from cache, no second render
        with _get(srv, "/v1/render?example=envelope&seconds=1.0",
                  timeout=30.0) as r:
            wav2 = r.read()
        assert wav2 == wav1
        after = srv.stats()
        assert after["renders"] == before["renders"] + 1
        assert after["cache_hits"] >= before["cache_hits"] + 1

    def test_single_flight_concurrent_identical(self, srv):
        before = srv.stats()
        results = []

        def fetch():
            with _get(srv, "/v1/render?example=envelope&seconds=0.7") as r:
                results.append(r.read())

        ts = [threading.Thread(target=fetch) for _ in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert len(results) == 2 and results[0] == results[1]
        after = srv.stats()
        # one render; the other request coalesced or hit the cache
        assert after["renders"] == before["renders"] + 1
        assert (after["cache_hits"] + after["coalesced"]
                >= before["cache_hits"] + before["coalesced"] + 1)

    def test_script_render(self, srv):
        body = {"script": TEST_SCRIPT, "seconds": 1.2,
                "notes": [[0.1, 0.5, 440.0], [0.7, 0.3, 660.0]]}
        with _post(srv, "/v1/render/script", body) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            sr, ch, pcm = _parse_wav(r.read())
        assert sr == 44100 and ch == 1 and len(pcm) == int(44100 * 1.2)
        mid = pcm[int(0.2 * sr):int(0.4 * sr)]
        tail = pcm[int(1.1 * sr):]
        assert np.abs(mid).max() > 100          # note sounding
        assert np.abs(tail).max() < np.abs(mid).max()  # released

    def test_script_module_selection_default_last(self, srv):
        # module omitted -> last exported module; explicit name also works
        body = {"script": TEST_SCRIPT, "seconds": 0.5,
                "module": "TestSynth", "notes": [[0.0, 0.3, 330.0]]}
        with _post(srv, "/v1/render/script", body) as r:
            sr, ch, pcm = _parse_wav(r.read())
        assert np.abs(pcm).max() > 50

    def test_script_compile_error_returns_diagnostics(self, srv):
        body = {"script": "Broken = defmodule begin out NoSuchThing() end",
                "seconds": 0.5}
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(srv, "/v1/render/script", body, timeout=30.0)
        assert ei.value.code == 400
        msg = json.loads(ei.value.read())["error"]
        assert "NoSuchThing" in msg or "^" in msg  # caret diagnostics

    def test_stats_endpoint(self, srv):
        with _get(srv, "/v1/stats", timeout=10.0) as r:
            stats = json.loads(r.read())
        assert stats["renders"] >= 1
        assert stats["audio_seconds_rendered"] > 0
        assert stats["cached_entries"] >= 1


class TestMidiEndpoint:
    @staticmethod
    def _midi_b64():
        import base64
        import sys

        sys.path.insert(0, "tests")
        from test_midi import note_off, note_on, smf, tempo

        data = smf([tempo(0, 400000),
                    note_on(0, 69) + note_off(480, 69)
                    + note_on(0, 72) + note_off(480, 72)])
        return base64.b64encode(data).decode()

    def test_midi_render(self, srv):
        body = {"midi_base64": self._midi_b64(), "instrument": "nice"}
        with _post(srv, "/v1/render/midi", body) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            sr, ch, pcm = _parse_wav(r.read())
        assert sr == 48000 and ch == 1
        assert np.abs(pcm[:sr]).max() > 100  # first note audible

    def test_midi_bad_base64_400(self, srv):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(srv, "/v1/render/midi", {"midi_base64": "not base64!"},
                  timeout=30.0)
        assert ei.value.code == 400

    def test_midi_not_a_midi_file_400(self, srv):
        import base64

        blob = base64.b64encode(b"RIFFnope").decode()
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(srv, "/v1/render/midi", {"midi_base64": blob}, timeout=30.0)
        assert ei.value.code == 400
        assert "MThd" in json.loads(ei.value.read())["error"]

    def test_midi_script_instrument_path_rejected(self, srv):
        # the CLI's zangscript FILE fallback must NOT be reachable over
        # HTTP (it reads server-local files)
        body = {"midi_base64": self._midi_b64(), "instrument": "/etc/hostname"}
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(srv, "/v1/render/midi", body, timeout=30.0)
        assert ei.value.code == 400
        assert "available" in json.loads(ei.value.read())["error"]

    def test_midi_part_cap_400(self, srv):
        # a tiny SMF of many minimal tracks with group=track must be
        # refused (part cap), not instantiate thousands of instruments
        import base64
        import sys

        sys.path.insert(0, "tests")
        from test_midi import note_off, note_on, smf

        data = smf([note_on(0, 60 + i % 12) + note_off(10, 60 + i % 12)
                    for i in range(24)])
        body = {"midi_base64": base64.b64encode(data).decode(),
                "group": "track"}
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(srv, "/v1/render/midi", body, timeout=30.0)
        assert ei.value.code == 400
        assert "parts" in json.loads(ei.value.read())["error"]

    def test_midi_truncated_file_400(self, srv):
        # a truncated track body must surface as 400 (MidiError), not a
        # 500 from an IndexError
        import base64
        import sys

        sys.path.insert(0, "tests")
        from test_midi import note_on, smf

        whole = smf([note_on(0, 60)])
        cut = (whole[:18] + (2).to_bytes(4, "big") + whole[22:24])
        body = {"midi_base64": base64.b64encode(cut).decode()}
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(srv, "/v1/render/midi", body, timeout=30.0)
        assert ei.value.code == 400
        assert "truncated" in json.loads(ei.value.read())["error"]

    def test_midi_in_menu(self, srv):
        with _get(srv, "/v1/examples", timeout=10.0) as r:
            menu = json.loads(r.read())
        assert "/v1/render/midi" in menu["endpoints"]
        assert "nice" in menu["midi_instruments"]


class TestStreamEndpoint:
    """GET /v1/render/stream: fixed-length WAV written incrementally."""

    def test_stream_sampler(self, srv):
        with _get(srv, "/v1/render/stream?config=sampler&seconds=2") as r:
            clen = int(r.headers["Content-Length"])
            data = r.read()
        assert len(data) == clen
        sr, ch, pcm = _parse_wav(data)
        assert sr == 44100 and ch == 1
        assert len(pcm) == int(2 * 44100)
        assert np.abs(pcm).max() > 100

    def test_stream_matches_offline_render(self, srv):
        """The streamed bytes must equal the buffered render of the same
        config (chunk-carried state, no seams)."""
        from zang_tpu.core.mixdown import mixdown_s16_np
        from zang_tpu.graph.render import render_performance
        from zang_tpu.host.configs import build_sampler_performance

        with _get(srv, "/v1/render/stream?config=sampler&seconds=1") as r:
            data = r.read()
        _sr, _ch, pcm = _parse_wav(data)
        perf, total = build_sampler_performance(seconds=1.0)
        ref = mixdown_s16_np(
            np.asarray(render_performance(perf, total, chunk_size=65536)),
            0.25).reshape(-1)
        assert np.array_equal(pcm, ref)

    def test_stream_unknown_config_404(self, srv):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(srv, "/v1/render/stream?config=nope", timeout=10.0)
        assert ei.value.code == 404

    def test_stream_seconds_over_cap_400(self, srv):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(srv, "/v1/render/stream?config=sampler&seconds=100000",
                 timeout=10.0)
        assert ei.value.code == 400

    def test_stream_failure_before_headers_is_clean_error(self, srv,
                                                          monkeypatch):
        """jax.jit compiles lazily, so the handler runs the FIRST chunk
        before sending headers — a graph that fails to compile or execute
        must answer a clean JSON error, never a truncated 200 WAV the
        client would mistake for audio."""
        import zang_tpu.graph.render as gr

        def broken_step_factory(perf, chunk_size=65536, jit=True):
            def step(state, c0, xs_chunk):
                raise RuntimeError("induced device failure")

            return step

        monkeypatch.setattr(gr, "make_stream_step", broken_step_factory)
        with pytest.raises(urllib.error.HTTPError) as ei:
            # unique seconds value: the broken step is cached under this key
            _get(srv, "/v1/render/stream?config=sampler&seconds=1.53",
                 timeout=60.0)
        assert ei.value.code == 500
        assert b"induced device failure" in ei.value.read()

    def test_stream_releases_render_slot_during_body_writes(self, srv):
        """The render slot is held only across device work: the body write
        is paced by the client's TCP window, and a slow consumer must not
        pin one of the few slots for the whole piece (otherwise two
        curl-at-1x listeners block every other endpoint)."""
        sem_values = []

        class _Wfile:
            @staticmethod
            def write(data):
                sem_values.append(srv._render_sem._value)

            @staticmethod
            def flush():
                pass

        class _FakeHandler:
            wfile = _Wfile()

            def send_response(self, code):
                sem_values.append(("headers", srv._render_sem._value))

            def send_header(self, *a):
                pass

            def end_headers(self):
                pass

        srv._handle_stream(_FakeHandler(),
                           {"config": ["sampler"], "seconds": ["1"]})
        writes = [v for v in sem_values if not isinstance(v, tuple)]
        assert writes, "no body writes recorded"
        # every write (incl. the WAV header) saw all slots free
        assert all(v == srv._render_sem._value for v in writes)
        assert min(writes) == max(writes) >= 2

    def test_stream_single_flight_shares_one_step(self, srv, monkeypatch):
        """Concurrent first requests for the same (config, seconds) must
        build ONE jitted step (jax then serializes the compile internally)
        instead of each paying the trace+compile."""
        import time

        import zang_tpu.serve.http as http_mod

        calls = []
        real_build = http_mod._build_config

        def slow_build(name, seconds):
            calls.append(name)
            time.sleep(0.3)  # force the second thread into the wait path
            return real_build(name, seconds)

        monkeypatch.setattr(http_mod, "_build_config", slow_build)
        results = []

        def fetch():
            with _get(srv,
                      "/v1/render/stream?config=sampler&seconds=1.21") as r:
                results.append(r.read())

        ts = [threading.Thread(target=fetch) for _ in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert len(calls) == 1, calls
        assert len(results) == 2 and results[0] == results[1]


class TestBatchEndpoint:
    """POST /v1/render/batch: tier-3 BatchRenderer over HTTP."""

    def test_batch_mixed_jobs(self, srv):
        body = {"jobs": [
            {"name": "drum", "config": "sampler", "seconds": 1.0},
            {"name": "synth", "script": TEST_SCRIPT, "seconds": 1.5,
             "notes": [[0.1, 0.5, 440.0]]},
        ], "volume": 0.3}
        with _post(srv, "/v1/render/batch", body) as r:
            resp = json.loads(r.read())
        results = {r_["name"]: r_ for r_ in resp["results"]}
        assert set(results) == {"drum", "synth"}
        for name, r_ in results.items():
            assert r_["status"] == "ok", r_
            assert r_["url"].startswith("/v1/result/")
        # fetch both WAVs back from the result store
        with _get(srv, results["drum"]["url"], timeout=30.0) as r:
            sr, ch, pcm = _parse_wav(r.read())
        assert sr == 44100 and len(pcm) == 44100
        assert np.abs(pcm).max() > 100
        with _get(srv, results["synth"]["url"], timeout=30.0) as r:
            sr, ch, pcm = _parse_wav(r.read())
        assert len(pcm) == int(1.5 * 44100)
        assert np.abs(pcm).max() > 100

    def test_batch_per_job_failure_status(self, srv):
        # a compile failure inside a job is reported per-job, not as an
        # HTTP error: the batch itself succeeded
        body = {"jobs": [
            {"name": "bad", "script": "Bad = defmodule begin out nope end"},
            {"name": "good", "config": "sampler", "seconds": 0.5},
        ]}
        with _post(srv, "/v1/render/batch", body) as r:
            resp = json.loads(r.read())
        results = {r_["name"]: r_ for r_ in resp["results"]}
        assert results["good"]["status"] == "ok"
        assert results["bad"]["status"] == "failed"
        assert results["bad"]["error"]

    def test_batch_bounds(self, srv):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(srv, "/v1/render/batch", {"jobs": []}, timeout=10.0)
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(srv, "/v1/render/batch",
                  {"jobs": [{"config": "sampler"}] * 99}, timeout=10.0)
        assert ei.value.code == 413
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(srv, "/v1/render/batch",
                  {"jobs": [{"what": 1}]}, timeout=10.0)
        assert ei.value.code == 400

    def test_result_miss_404(self, srv):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(srv, "/v1/result/deadbeef", timeout=10.0)
        assert ei.value.code == 404
