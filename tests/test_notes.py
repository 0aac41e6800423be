"""Event-system tests ported from the reference's unit tests.

PolyphonyDispatcher cases: src/zang/notes_test.zig:10-119.
Trigger cases: src/zang/trigger_test.zig:38-132.
Plus extra coverage for ImpulseQueue / NoteTracker edge rules.
"""

import numpy as np

from zang_tpu.core import (
    Impulse,
    ImpulseQueue,
    ImpulsesAndParamses,
    NoteTracker,
    PolyphonyDispatcher,
    SongEvent,
    Span,
    Trigger,
)


def iap(entries):
    """entries: list of (frame, note_id, event_id, params)"""
    out = ImpulsesAndParamses()
    for frame, note_id, event_id, params in entries:
        out.impulses.append(Impulse(frame, note_id, event_id))
        out.paramses.append(params)
    return out


ON = {"note_on": True}
OFF = {"note_on": False}


class TestPolyphonyDispatcher:
    def test_five_note_ons_three_slots(self):
        pd = PolyphonyDispatcher(3)
        result = pd.dispatch(
            iap(
                [
                    (100, 1, 1, ON),
                    (200, 2, 2, ON),
                    (300, 3, 3, ON),
                    (400, 4, 4, ON),
                    (500, 5, 5, ON),
                ]
            )
        )
        assert result[0].impulses[0].note_id == 1
        assert result[1].impulses[0].note_id == 2
        assert result[2].impulses[0].note_id == 3
        assert result[0].impulses[1].note_id == 4
        assert result[1].impulses[1].note_id == 5
        assert [len(r) for r in result] == [2, 2, 1]

    def test_single_note_on_and_off(self):
        pd = PolyphonyDispatcher(3)
        result = pd.dispatch(
            iap(
                [
                    (100, 1, 1, ON),
                    (200, 1, 2, OFF),
                    (300, 2, 3, ON),
                    (400, 2, 4, OFF),
                    (500, 3, 5, ON),
                ]
            )
        )
        assert [i.note_id for i in result[0].impulses] == [1, 1]
        assert [i.note_id for i in result[1].impulses] == [2, 2]
        assert [i.note_id for i in result[2].impulses] == [3]

    def test_reuse_least_recently_released_slot(self):
        pd = PolyphonyDispatcher(3)
        result = pd.dispatch(
            iap(
                [
                    (100, 1, 1, ON),
                    (200, 2, 2, ON),
                    (300, 3, 3, ON),
                    (400, 3, 4, OFF),
                    (500, 2, 5, OFF),
                    (600, 1, 6, OFF),
                    (700, 4, 7, ON),
                ]
            )
        )
        assert result[0].impulses[0].note_id == 1
        assert result[1].impulses[0].note_id == 2
        assert result[2].impulses[0].note_id == 3
        assert result[2].impulses[1].note_id == 3
        assert result[1].impulses[1].note_id == 2
        assert result[0].impulses[1].note_id == 1
        # slot 2 had the least recent note-off, so note 4 goes there
        assert result[2].impulses[2].note_id == 4
        assert [len(r) for r in result] == [2, 2, 3]


SPAN = Span(0, 1024)


def expect_all(trigger, iap_obj, expected):
    results = list(trigger.iterate(SPAN, iap_obj))
    assert len(results) == len(expected)
    for r, (start, end, params, changed) in zip(results, expected):
        assert (r.span.start, r.span.end) == (start, end)
        assert r.params == params
        assert r.note_id_changed == changed


class TestTrigger:
    def test_no_notes(self):
        expect_all(Trigger(), iap([]), [])

    def test_first_note_at_frame_0(self):
        t = Trigger()
        expect_all(t, iap([(0, 1, 1, 440.0)]), [(0, 1024, 440.0, True)])

    def test_first_note_after_frame_0(self):
        t = Trigger()
        expect_all(t, iap([(500, 1, 1, 440.0)]), [(500, 1024, 440.0, True)])

    def test_carryover(self):
        t = Trigger()
        expect_all(
            t,
            iap([(0, 1, 1, 440.0), (200, 2, 2, 220.0)]),
            [(0, 200, 440.0, True), (200, 1024, 220.0, True)],
        )
        # same note id on the second impulse: params update, no id change
        expect_all(
            t,
            iap([(500, 3, 1, 330.0), (600, 3, 2, 660.0)]),
            [
                (0, 500, 220.0, False),
                (500, 600, 330.0, True),
                (600, 1024, 660.0, False),
            ],
        )
        # nothing new: current note plays the whole block
        expect_all(t, iap([]), [(0, 1024, 660.0, False)])

    def test_two_notes_same_frame_later_wins(self):
        t = Trigger()
        expect_all(
            t,
            iap([(200, 1, 1, 440.0), (200, 2, 2, 220.0)]),
            [(200, 1024, 220.0, True)],
        )


class TestImpulseQueue:
    def test_push_consume(self):
        q = ImpulseQueue()
        q.push(10, 1, ON)
        q.push(20, 2, ON)
        out = q.consume()
        assert [i.frame for i in out.impulses] == [10, 20]
        assert [i.event_id for i in out.impulses] == [1, 2]
        assert len(q.consume()) == 0

    def test_out_of_order_dropped(self):
        q = ImpulseQueue()
        q.push(100, 1, ON)
        q.push(50, 2, ON)  # silently dropped (notes.zig:108-118)
        out = q.consume()
        assert [i.note_id for i in out.impulses] == [1]

    def test_overflow_dropped(self):
        q = ImpulseQueue()
        for i in range(40):
            q.push(i, i + 1, ON)
        out = q.consume()
        assert len(out) == 32
        # event ids only advance on successful push
        assert out.impulses[-1].event_id == 32


class TestNoteTracker:
    def test_frames_within_block(self):
        song = [
            SongEvent(params={"note_on": True, "freq": 440.0}, t=0.0, note_id=1),
            SongEvent(params={"note_on": False, "freq": 440.0}, t=0.01, note_id=1),
        ]
        tr = NoteTracker(song)
        out = tr.consume(44100.0, Span(0, 1024))
        assert [i.frame for i in out.impulses] == [0, 441]
        assert [i.event_id for i in out.impulses] == [1, 2]

    def test_block_boundary_f32_accumulation(self):
        # event right at a late block boundary: frame must match the f32
        # accumulated tracker clock, not exact rational arithmetic
        song = [SongEvent(params={"note_on": True}, t=100.0, note_id=1)]
        tr = NoteTracker(song)
        sr = 44100.0
        block = 1024
        frames = []
        t = np.float32(0.0)
        total = 0
        for _ in range(5000):
            out = tr.consume(sr, Span(0, block))
            for imp in out.impulses:
                frames.append(total + imp.frame)
            total += block
            if frames:
                break
        assert len(frames) == 1
        # ~100s * 44100 = 4,410,000 — allow f32 clock drift but not much
        assert abs(frames[0] - 4410000) < 4096

    def test_clamp_to_last_frame(self):
        # event just before end of block lands at out_len-1 at the latest
        song = [SongEvent(params={}, t=0.02319, note_id=1)]
        tr = NoteTracker(song)
        out = tr.consume(44100.0, Span(0, 1024))
        assert len(out.impulses) == 1
        assert out.impulses[0].frame <= 1023
