"""Incremental live planners (host/liveplan.py) vs full re-plan: bit-exact.

The incremental path carries planner walk state across blocks (O(events)
host work); the fallback re-plans the whole session each event block. Both
must produce identical device programs, hence identical audio.
"""

import os
import random

import numpy as np
import pytest

from zang_tpu.host import instruments as ti
from zang_tpu.host.live import LiveSession

SR = 48000.0
KEYS = "zxcvbnm,.q2w3er5t6y7u"


def _drive(sess, seed, blocks, parts, events_per_block=1):
    rng = random.Random(seed)
    held = [{} for _ in range(parts)]
    out = []
    for b in range(blocks):
        for _ in range(events_per_block):
            if rng.random() < 0.8:
                part = rng.randrange(parts)
                k = rng.choice(KEYS)
                if k in held[part]:
                    sess.key_event(part, k, False, note_ids=held[part])
                else:
                    sess.key_event(part, k, True, note_ids=held[part])
        out.append(sess.render_block())
    return np.concatenate(out, axis=1)


def _compare(make_parts, seed=0, blocks=40, events_per_block=1):
    parts = make_parts()
    n = len(parts)
    os.environ["ZANG_LIVE_INC"] = "1"
    inc = LiveSession(parts, SR, block_size=1024)
    assert all(p.planner is not None for p in inc.parts), (
        "incremental planner not active — live_planner missing?"
    )
    audio_inc = _drive(inc, seed, blocks, n, events_per_block)

    os.environ["ZANG_LIVE_INC"] = "0"
    try:
        full = LiveSession(make_parts(), SR, block_size=1024)
        assert all(p.planner is None for p in full.parts)
        audio_full = _drive(full, seed, blocks, n, events_per_block)
    finally:
        os.environ.pop("ZANG_LIVE_INC", None)

    np.testing.assert_array_equal(audio_inc, audio_full)


def test_nice_instrument_bit_exact():
    _compare(lambda: [(ti.NiceInstrument(0.25), 4)])


def test_pmosc_bit_exact():
    _compare(lambda: [(ti.PMOscInstrument(0.4), 3)], seed=1)


def test_hard_square_gate_bit_exact():
    _compare(lambda: [(ti.HardSquareInstrument(), 2)], seed=2)


def test_filtered_sawtooth_bit_exact():
    _compare(lambda: [(ti.FilteredSawtoothInstrument(), 2)], seed=3)


def test_multi_part_dense_events_bit_exact():
    _compare(
        lambda: [(ti.NiceInstrument(0.3), 4), (ti.PMOscInstrument(0.5), 2)],
        seed=4, blocks=60, events_per_block=3,
    )


def test_idle_blocks_then_late_events():
    """Long silence, then events: active_from masking and window fill stay
    equivalent when the first event arrives far from frame 0."""

    def run(flag):
        os.environ["ZANG_LIVE_INC"] = flag
        try:
            sess = LiveSession([(ti.NiceInstrument(0.3), 2)], SR,
                               block_size=1024)
            out = [sess.render_block() for _ in range(20)]  # pure silence
            held = {}
            sess.key_event(0, "z", True, note_ids=held)
            out += [sess.render_block() for _ in range(10)]
            sess.key_event(0, "z", False, note_ids=held)
            out += [sess.render_block() for _ in range(30)]  # release + idle
            return np.concatenate(out, axis=1)
        finally:
            os.environ.pop("ZANG_LIVE_INC", None)

    a, b = run("1"), run("0")
    assert np.abs(a).max() > 0  # the note actually sounded
    np.testing.assert_array_equal(a, b)


def test_held_note_across_many_blocks():
    """A note held across many blocks exercises the provisional open-segment
    paint (attack -> decay -> sustain emitted from a snapshot each block)."""

    def run(flag):
        os.environ["ZANG_LIVE_INC"] = flag
        try:
            sess = LiveSession([(ti.PMOscInstrument(0.4), 1)], SR,
                               block_size=1024)
            held = {}
            sess.key_event(0, "q", True, note_ids=held)
            out = [sess.render_block() for _ in range(50)]
            sess.key_event(0, "q", False, note_ids=held)
            out += [sess.render_block() for _ in range(30)]
            return np.concatenate(out, axis=1)
        finally:
            os.environ.pop("ZANG_LIVE_INC", None)

    a, b = run("1"), run("0")
    np.testing.assert_array_equal(a, b)


def test_same_frame_collision():
    """Two impulses at the same frame: the later one wins (trigger.zig
    same-frame rule) identically on both paths."""

    def run(flag):
        os.environ["ZANG_LIVE_INC"] = flag
        try:
            sess = LiveSession([(ti.NiceInstrument(0.3), 1)], SR,
                               block_size=1024)
            sess.push_event(0, {"freq": 440.0, "note_on": True})
            sess.push_event(0, {"freq": 660.0, "note_on": True})
            out = [sess.render_block() for _ in range(8)]
            return np.concatenate(out, axis=1)
        finally:
            os.environ.pop("ZANG_LIVE_INC", None)

    a, b = run("1"), run("0")
    assert np.abs(a).max() > 0
    np.testing.assert_array_equal(a, b)


def test_slot_capacity_auto_grows():
    """A dense event block overflows the program window: the session grows
    slot_capacity and re-jits instead of crashing (the reference silently
    drops events past its 32-impulse cap; we keep them all)."""

    def run(cap):
        # monophonic + staggered impulse frames: 8 segments in one block on
        # one voice (same-frame events would collapse via later-wins)
        sess = LiveSession([(ti.NiceInstrument(0.3), 1)], SR,
                           block_size=1024, slot_capacity=cap)
        for i, freq in enumerate([220.0, 262.0, 330.0, 392.0,
                                  440.0, 523.0, 660.0, 784.0]):
            sess.push_event(0, {"freq": freq, "note_on": True},
                            impulse_frame=i * 120)
        out = [sess.render_block()]
        sess.push_event(0, {"freq": 784.0, "note_on": False})
        out += [sess.render_block() for _ in range(6)]
        return np.concatenate(out, axis=1), sess.slot_capacity

    small, grown = run(2)
    big, kept = run(32)
    assert grown > 2  # it actually grew
    assert kept == 32
    # different KP -> different pconst sum trees -> 1-ulp reassociation noise
    np.testing.assert_allclose(small, big, rtol=0, atol=2e-6)
