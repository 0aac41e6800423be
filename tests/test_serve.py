"""Batch serving (SCALING.md tier 3): shared compiles, scheduling, retry,
streamed WAV output. Runs on the virtual 8-device CPU mesh (conftest)."""

import numpy as np
import pytest

import jax

from zang_tpu.core.mixdown import mixdown_s16_np
from zang_tpu.core.notes import SongEvent
from zang_tpu.core.timeline import compile_timelines
from zang_tpu.core.wav import read_wav, write_wav_s16, StreamingWavWriter
from zang_tpu.graph.render import Performance, render_performance
from zang_tpu.host import instruments as ti
from zang_tpu.serve.batch import BatchRenderer, RenderJob, render_song_shared

SR = 48000.0
CHUNK = 2048  # multiple of the 512 tile; small so tests stay fast


def _song(notes, seconds):
    """notes: [(t_on, t_off, freq)] -> (Performance, total_frames)."""
    events = []
    nid = 1
    for t_on, t_off, freq in notes:
        events.append(SongEvent({"freq": freq, "note_on": True}, t_on, nid))
        events.append(SongEvent({"freq": freq, "note_on": False}, t_off, nid))
        nid += 1
    events.sort(key=lambda e: e.t)
    total = int(seconds * SR)
    tls = compile_timelines(events, 2, SR, total)
    perf = Performance([(ti.NiceInstrument(0.3), tls)], SR)
    return perf, total


SONG_A = [(0.02, 0.3, 440.0), (0.25, 0.6, 550.0), (0.7, 0.9, 660.0)]
SONG_B = [(0.0, 0.5, 220.0), (0.1, 0.4, 330.0)]
SONG_C = [(0.05, 0.2, 880.0), (0.3, 0.5, 770.0), (0.55, 0.8, 440.0),
          (0.85, 1.1, 523.25)]


def test_shared_render_matches_reference():
    """Segmented + padded shared-graph renders equal the one-scan render."""
    br = BatchRenderer(chunk_size=CHUNK, segment_chunks=2)
    for notes, seconds in [(SONG_A, 1.0), (SONG_B, 0.7)]:
        perf, total = _song(notes, seconds)
        got = render_song_shared(br.cache, perf, total, CHUNK,
                                 segment_chunks=2)
        perf2, _ = _song(notes, seconds)
        want = render_performance(perf2, total, chunk_size=CHUNK)
        assert got.shape == want.shape
        # segmented scan vs one scan: XLA fuses differently -> 1-ulp noise
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-6)
        num = float(np.sqrt(np.mean((got - want) ** 2)))
        den = float(np.sqrt(np.mean(want**2))) or 1.0
        assert 20 * np.log10(max(num / den, 1e-30)) < -120.0


def test_compile_shared_across_songs():
    """Songs with the same instrument graph but different events/lengths
    share ONE trace (the tier-3 compile-cache design)."""
    # one device -> one executable; traces count (graph, device) retraces
    br = BatchRenderer(chunk_size=CHUNK, segment_chunks=2,
                       devices=[jax.devices()[0]])
    jobs = [
        RenderJob("a", lambda: _song(SONG_A, 1.0)),
        RenderJob("b", lambda: _song(SONG_B, 0.7)),
        RenderJob("c", lambda: _song(SONG_C, 1.3)),
    ]
    results = br.run(jobs)
    assert all(r.status == "ok" for r in results), [r.error for r in results]
    assert br.cache.traces == 1, f"expected 1 trace, got {br.cache.traces}"
    # a different instrument config must NOT share
    perf, total = _song(SONG_A, 0.5)
    perf_other = Performance(
        [(ti.NiceInstrument(0.9), perf.parts[0][1])], SR
    )
    render_song_shared(br.cache, perf_other, total, CHUNK, segment_chunks=2)
    assert br.cache.traces == 2


def test_failed_job_requeued():
    calls = {"n": 0}

    def flaky_build():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected worker failure")
        return _song(SONG_B, 0.5)

    br = BatchRenderer(chunk_size=CHUNK, segment_chunks=2, max_attempts=3)
    results = br.run([RenderJob("flaky", flaky_build)])
    assert results[0].status == "ok"
    assert results[0].attempts == 2


def test_job_fails_after_max_attempts():
    def doomed():
        raise ValueError("always broken")

    br = BatchRenderer(chunk_size=CHUNK, segment_chunks=2, max_attempts=2)
    results = br.run([RenderJob("doomed", doomed)])
    assert results[0].status == "failed"
    assert "always broken" in results[0].error
    assert results[0].attempts == 2


def test_streamed_wav_output(tmp_path):
    """out_dir mode streams segment WAVs; bytes match a one-shot write of
    the reference render's mixdown."""
    br = BatchRenderer(out_dir=str(tmp_path), chunk_size=CHUNK,
                       segment_chunks=2)
    results = br.run([RenderJob("s", lambda: _song(SONG_A, 1.0),
                                volume=0.25)])
    assert results[0].status == "ok"
    w = read_wav(results[0].wav_path)
    assert w.sample_rate == int(SR) and w.bits_per_sample == 16

    perf, total = _song(SONG_A, 1.0)
    want = mixdown_s16_np(render_performance(perf, total, chunk_size=CHUNK),
                          0.25)
    got = np.frombuffer(w.data, dtype="<i2")
    # f32 1-ulp fusion noise may flip the i16 LSB on a few samples
    assert got.shape == want.reshape(-1).shape
    assert np.abs(got.astype(np.int32) - want.reshape(-1).astype(np.int32)).max() <= 1


def test_streaming_writer_matches_oneshot(tmp_path):
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal((2, 1000)) * 8000).astype(np.int16)
    p1, p2 = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    write_wav_s16(p1, pcm, 44100, num_channels=2)
    with StreamingWavWriter(p2, 44100, num_channels=2) as w:
        w.append(pcm[:, :300])
        w.append(pcm[:, 300:])
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_multi_device_scheduling():
    """Jobs spread over the virtual device fleet; every render lands."""
    devices = jax.devices()[:2]
    assert len(devices) == 2
    br = BatchRenderer(chunk_size=CHUNK, segment_chunks=2, devices=devices)
    jobs = [
        RenderJob(f"j{i}", (lambda i=i: _song(SONG_A if i % 2 else SONG_B,
                                              0.5 + 0.1 * i)))
        for i in range(4)
    ]
    results = br.run(jobs)
    assert all(r.status == "ok" for r in results), [r.error for r in results]
    # at most one executable per device (jit re-specializes per device)
    assert br.cache.traces <= len(devices)


def test_script_instrument_jobs_share_compile():
    """DSL-instrument songs serve through the shared graph too (equal-config
    ScriptInstruments hash by script + module, sharing one executable)."""
    from zang_tpu.script.compile import compile_script
    from zang_tpu.script.jax_backend import ScriptInstrument

    SRC = """
Voice = defmodule
    freq: constant,
    note_on: boolean,
begin
    out SineOsc(freq, phase=0)
        * Envelope(attack=.cubed(0.02), decay=.cubed(0.1),
                   release=.cubed(0.3), sustain_volume=0.6, note_on)
end
"""
    compiled = compile_script(SRC, filename="<serve>")

    def song(notes, seconds):
        events = []
        nid = 1
        for t_on, t_off, freq in notes:
            events.append(SongEvent({"freq": freq, "note_on": True}, t_on, nid))
            events.append(SongEvent({"freq": freq, "note_on": False}, t_off, nid))
            nid += 1
        events.sort(key=lambda e: e.t)
        total = int(seconds * SR)
        tls = compile_timelines(events, 2, SR, total)
        inst = ScriptInstrument(compiled, "Voice")
        return Performance([(inst, tls)], SR), total

    br = BatchRenderer(chunk_size=CHUNK, segment_chunks=2,
                       devices=[jax.devices()[0]])
    jobs = [
        RenderJob("sa", lambda: song(SONG_A, 1.0)),
        RenderJob("sb", lambda: song(SONG_B, 0.7)),
    ]
    results = br.run(jobs)
    assert all(r.status == "ok" for r in results), [r.error for r in results]
    assert br.cache.traces == 1, br.cache.traces
    assert all(np.abs(r.audio).max() > 0 for r in results)

    # matches the one-scan reference render (1-ulp fusion tolerance)
    perf, total = song(SONG_A, 1.0)
    want = render_performance(perf, total, chunk_size=CHUNK)
    np.testing.assert_allclose(results[0].audio, want, rtol=0, atol=2e-6)


def test_duplicate_job_names_rejected():
    br = BatchRenderer(chunk_size=CHUNK, segment_chunks=2)
    jobs = [RenderJob("same", lambda: _song(SONG_B, 0.5)),
            RenderJob("same", lambda: _song(SONG_B, 0.5))]
    with pytest.raises(ValueError, match="duplicate job names"):
        br.run(jobs)


def test_graph_cache_eviction_bound():
    from zang_tpu.serve.batch import SharedGraphCache

    cache = SharedGraphCache(max_entries=2)
    perfs = [_song(SONG_B, 0.5)[0] for _ in range(3)]
    from zang_tpu.serve.batch import _split_programs

    for perf in perfs:
        skeleton, _ = _split_programs(perf.programs)
        cache.get(perf, skeleton, CHUNK, 2)
    assert len(cache._fns) <= 2
    assert len(cache._pinned) <= 2
