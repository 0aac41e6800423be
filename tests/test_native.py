"""The C++ host event compiler (core/native.py) must be segment-table
identical to the Python pipeline (tracker -> dispatcher -> trigger) on any
song: same f32 frame quantization, slot routing, carry, and dedup."""

import os

import numpy as np
import pytest

from zang_tpu.core import native
from zang_tpu.core import timeline as tlmod
from zang_tpu.core.notes import SongEvent

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native compiler unavailable (no g++?)"
)


def py_compile(*args, **kwargs):
    os.environ["ZANG_NATIVE"] = "0"
    try:
        return tlmod.compile_timelines(*args, **kwargs)
    finally:
        os.environ["ZANG_NATIVE"] = "1"


def assert_same(a, b):
    assert len(a) == len(b)
    for ta, tb in zip(a, b):
        assert np.array_equal(ta.starts, tb.starts)
        assert np.array_equal(ta.resets, tb.resets)
        assert ta.params == tb.params
        assert ta.total == tb.total


def random_song(rng, seconds=10.0, max_events=120):
    """Interleaved note on/off stream with overlap (drives voice stealing)."""
    E = int(rng.integers(1, max_events))
    ts = np.sort(rng.uniform(0, seconds, E).astype(np.float32))
    song, open_ids, nid = [], [], 1
    for t in ts:
        if open_ids and rng.random() < 0.45:
            k = open_ids.pop(int(rng.integers(0, len(open_ids))))
            song.append(SongEvent(
                {"freq": float(np.float32(rng.uniform(100, 800))),
                 "note_on": False}, t=float(t), note_id=k))
        else:
            song.append(SongEvent(
                {"freq": float(np.float32(rng.uniform(100, 800))),
                 "note_on": True}, t=float(t), note_id=nid))
            open_ids.append(nid)
            nid += 1
    return song


def test_bach_song_identical():
    from zang_tpu.host import song as sm

    song = sm.load_song()
    total = int(60 * sm.SAMPLE_RATE)
    for i in range(3):
        a = py_compile(song[i], sm.POLYPHONY[i], sm.SAMPLE_RATE, total)
        b = native.compile_timelines_native(
            song[i], sm.POLYPHONY[i], sm.SAMPLE_RATE, total)
        assert_same(a, b)


@pytest.mark.parametrize("seed", range(8))
def test_fuzzed_songs_identical(seed):
    rng = np.random.default_rng(seed)
    song = random_song(rng)
    poly = int(rng.integers(1, 6))
    total = int(11 * 48000)
    assert_same(
        py_compile(song, poly, 48000.0, total),
        native.compile_timelines_native(song, poly, 48000.0, total),
    )


def test_same_frame_collision_and_stealing():
    # same-frame impulses (later wins) + more notes than slots (stealing)
    song = []
    for k in range(6):
        song.append(SongEvent({"freq": 100.0 + k, "note_on": True},
                              t=0.01, note_id=k + 1))
    for k in range(6):
        song.append(SongEvent({"freq": 100.0 + k, "note_on": False},
                              t=0.5 + 0.01 * k, note_id=k + 1))
    total = 48000
    assert_same(
        py_compile(song, 3, 48000.0, total),
        native.compile_timelines_native(song, 3, 48000.0, total),
    )


def test_unhashable_params_fall_back():
    # curve-valued params can't be equality-classed; compile_timelines must
    # silently use the Python path
    song = [SongEvent({"note_on": True, "curve": [1.0, 2.0]}, t=0.0, note_id=1)]
    tls = tlmod.compile_timelines(song, 1, 48000.0, 4800)
    assert len(tls) == 1 and len(tls[0].starts) == 1


class TestNativeEnvelope:
    """core/native.py zt_compile_envelope must emit bit-identical segment
    tuples to the Python painter walk (ops/control.py)."""

    def _fuzz_song(self, rng, secs=6.0):
        song, nid, t = [], 1, 0.05
        while t < secs - 0.5:
            dur = float(rng.uniform(0.05, 1.2))
            song.append(SongEvent({"freq": 220.0, "note_on": True},
                                  t=t, note_id=nid))
            song.append(SongEvent({"freq": 220.0, "note_on": False},
                                  t=min(t + dur, secs - 0.2), note_id=nid))
            nid += 1
            t += float(rng.uniform(0.1, 1.0))
        song.sort(key=lambda e: (e.t, e.note_id))
        return song

    @pytest.mark.parametrize("seed", range(10))
    def test_fuzzed_envelopes_bit_identical(self, seed):
        from zang_tpu.core.curves import PaintCurve
        from zang_tpu.ops import control

        rng = np.random.default_rng(seed)
        sr, secs = 48000.0, 6.0
        total = int(secs * sr)
        song = self._fuzz_song(rng, secs)
        kinds = [PaintCurve.linear, PaintCurve.squared, PaintCurve.cubed]
        env_const = {
            "attack": kinds[seed % 3](float(rng.uniform(0.005, 0.3))),
            "decay": kinds[(seed + 1) % 3](float(rng.uniform(0.01, 0.3))),
            "release": kinds[(seed + 2) % 3](float(rng.uniform(0.05, 1.0))),
            "sustain_volume": float(np.float32(rng.uniform(0.3, 1.0))),
        }
        if seed % 4 == 0:
            env_const["attack"] = PaintCurve.instantaneous()
        fn = lambda k, p: {**env_const, "note_on": bool(p["note_on"])}
        tl = tlmod.compile_timelines(song, 2, sr, total)[0]

        os.environ["ZANG_NATIVE"] = "0"
        try:
            py_segs = __import__("zang_tpu.ops.control", fromlist=["x"]).compile_envelope(tl, sr, fn)
        finally:
            os.environ["ZANG_NATIVE"] = "1"
        d = native.compile_envelope_native(tl, sr, fn)
        got = list(zip(d["start"].tolist(), d["a"].tolist(), d["b"].tolist(),
                       d["t_step"].tolist(), d["t0"].tolist(),
                       d["shape"].tolist()))
        want = [(int(s), float(np.float32(a)), float(np.float32(b)),
                 float(np.float32(ts)), float(np.float32(t0)), int(sh))
                for s, a, b, ts, t0, sh in py_segs]
        assert got == want
