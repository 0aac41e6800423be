"""Song pipeline tests: tracker parser + Bach song golden comparison."""

import numpy as np
import pytest

from zang_tpu.host.songparse import parse_song, SongParseError
from zang_tpu.host import song as sm
from zang_tpu.graph.fidelity import deviation_dbfs

F32 = np.float32


FIXTURE = """
# tiny test song
rate 2.0
|C-4 E-4|A-5
|off    |
tempo 0.5  |G-4    |off
|off off|
"""


class TestSongParse:
    def test_columns_and_events(self):
        events = parse_song(FIXTURE, [2, 1], note_duration=0.15, a4=440.0)
        inst0, inst1 = events
        # C-4, E-4 on; offs; G-4 on (col 0), final offs
        kinds = [(e.params["note_on"], round(e.t, 4)) for e in inst0]
        # t steps: 0.075 (rate 2), then 0.075, then 0.15 (tempo 0.5)
        assert kinds[0] == (True, 0.0) and kinds[1] == (True, 0.0)
        assert kinds[2] == (False, 0.075)  # C-4 off
        assert inst0[3].params["note_on"] is True  # G-4 on at 0.15
        assert inst0[3].t == pytest.approx(0.15)
        # last row: off for G-4 (only one active note in col 0, col 1 empty)
        assert inst0[-1].params["note_on"] is False
        assert inst0[-1].t == pytest.approx(0.15 + 0.15 / (2.0 * 0.5))
        # instrument 1: A-5 on, off
        assert [e.params["note_on"] for e in inst1] == [True, False]
        # frequency: A-5 = 880
        assert inst1[0].params["freq"] == pytest.approx(880.0, rel=1e-6)

    def test_note_off_inserted_before_retrigger(self):
        txt = "|C-4\n|D-4\n"
        (ev,) = parse_song(txt, [1])
        # C on; then C off + D on at same t, off (id order) first
        assert [e.params["note_on"] for e in ev] == [True, False, True]
        assert ev[1].note_id == ev[0].note_id
        assert ev[1].t == ev[2].t

    def test_start_resets(self):
        txt = "|C-4\nstart\n|D-4\n"
        (ev,) = parse_song(txt, [1])
        # `start` clears accumulated events and rewinds t, but the reference
        # deliberately does NOT clear column_last_note (example_song.zig:146
        # TODO), so a stale note-off for C-4 is emitted before D-4's on.
        assert [e.params["note_on"] for e in ev] == [False, True]
        assert all(e.t == 0.0 for e in ev)

    def test_too_many_columns_raises(self):
        with pytest.raises(SongParseError):
            parse_song("|C-4 D-4 E-4\n", [1])

    def test_ids_are_global_and_chronological(self):
        events = parse_song(FIXTURE, [2, 1])
        all_on = [e for ev in events for e in ev if e.params["note_on"]]
        ids = sorted(e.note_id for e in all_on)
        assert ids == list(range(1, len(ids) + 1))


class TestBachSong:
    def test_load(self):
        song = sm.load_song()
        assert len(song) == 3
        assert len(song[1]) > 6000  # RegularOrgan is busy
        for ev in song:
            ts = [e.t for e in ev]
            assert ts == sorted(ts)

    @pytest.mark.slow
    def test_song_golden_10s(self):
        a = sm.render_song_oracle(10.0)
        b = sm.render_song(10.0, chunk_size=16384)
        dev = deviation_dbfs(a, b)
        print(f"\nbach 10s: rms {dev[0]:.1f} dBFS, peak {dev[1]:.1f} dBFS")
        assert dev[0] < -90.0, dev
