"""MIDI file input (host/midi.py): SMF parsing, tempo-map timing, the
tracker-style note_id pairing semantics, and an end-to-end render.

The SMF fixtures are built by hand here (stdlib byte packing) so every
parser feature — variable-length deltas, running status, merged tempo
maps, skipped metas/sysex — is exercised from known bytes."""

import numpy as np
import pytest

from zang_tpu.host.midi import (
    MidiError,
    midi_songs,
    parse_smf,
    render_midi,
)


def varlen(v: int) -> bytes:
    out = [v & 0x7F]
    v >>= 7
    while v:
        out.append(0x80 | (v & 0x7F))
        v >>= 7
    return bytes(reversed(out))


def track(events: bytes) -> bytes:
    body = events + bytes([0x00, 0xFF, 0x2F, 0x00])  # end of track
    return b"MTrk" + len(body).to_bytes(4, "big") + body


def smf(tracks, fmt=1, division=480) -> bytes:
    head = (b"MThd" + (6).to_bytes(4, "big") + fmt.to_bytes(2, "big")
            + len(tracks).to_bytes(2, "big") + division.to_bytes(2, "big"))
    return head + b"".join(track(t) for t in tracks)


def note_on(dt, key, vel=100, ch=0) -> bytes:
    return varlen(dt) + bytes([0x90 | ch, key, vel])


def note_off(dt, key, ch=0) -> bytes:
    return varlen(dt) + bytes([0x80 | ch, key, 64])


def tempo(dt, uspq) -> bytes:
    return varlen(dt) + bytes([0xFF, 0x51, 0x03]) + uspq.to_bytes(3, "big")


class TestParser:
    def test_varlen_and_running_status(self):
        # running status: later events omit the 0x90 status byte
        ev = (note_on(0, 60)
              + varlen(480) + bytes([62, 100])   # running status note-on
              + varlen(200) + bytes([60, 0])     # vel 0 = note off
              + note_off(40, 62))
        m = parse_smf(smf([ev]))
        assert m.division == 480
        assert m.notes[0] == [(0, 0, 60, 100), (480, 0, 62, 100),
                              (680, 0, 60, 0), (720, 0, 62, 0)]

    def test_long_varlen_delta(self):
        ev = note_on(0, 60) + note_off(100000, 60)  # multi-byte delta
        m = parse_smf(smf([ev]))
        assert m.notes[0][1][0] == 100000

    def test_skips_other_messages(self):
        ev = (varlen(0) + bytes([0xB0, 7, 100])        # CC volume
              + varlen(0) + bytes([0xC0, 5])           # program change
              + varlen(0) + bytes([0xF0, 0x02, 1, 0xF7])  # sysex
              + varlen(0) + bytes([0xFF, 0x03, 0x03]) + b"abc"  # name meta
              + note_on(10, 64) + note_off(10, 64))
        m = parse_smf(smf([ev]))
        assert m.notes[0] == [(10, 0, 64, 100), (20, 0, 64, 0)]

    def test_rejects_garbage(self):
        with pytest.raises(MidiError):
            parse_smf(b"RIFFxxxx")
        with pytest.raises(MidiError):
            parse_smf(smf([note_on(0, 60)], fmt=2))
        with pytest.raises(MidiError):  # SMPTE division
            parse_smf(smf([note_on(0, 60)], division=0xE250))

    def test_truncated_events_raise_midierror_not_indexerror(self):
        # crafted tracks whose declared length cuts an event short must
        # fail as MidiError (the HTTP tier's 400), never IndexError, and
        # never read past the track end into following bytes
        whole = smf([note_on(0, 60) + note_off(480, 60)])

        def cut(data: bytes, keep: int) -> bytes:
            # shrink the declared MTrk length to `keep` body bytes
            head, hdr, body = data[:14], data[14:22], data[22:]
            return (head + hdr[:4] + keep.to_bytes(4, "big")
                    + body[:keep])

        body_len = int.from_bytes(whole[18:22], "big")
        # body = note-on(4B) + note-off(5B) + end-meta(4B): keeps at the
        # clean event boundaries {4, 9} parse fine (no end-of-track meta is
        # tolerated); every mid-event cut must raise
        for keep in set(range(1, body_len)) - {4, 9}:
            with pytest.raises(MidiError):
                parse_smf(cut(whole, keep))
        # a status byte whose data bytes live in the NEXT track must not
        # be silently consumed from there
        t1 = varlen(0) + bytes([0x90])  # note-on missing key+vel
        hdr = b"MTrk" + len(t1).to_bytes(4, "big") + t1
        full = (b"MThd" + (6).to_bytes(4, "big") + (1).to_bytes(2, "big")
                + (2).to_bytes(2, "big") + (480).to_bytes(2, "big")
                + hdr + track(note_on(0, 72) + note_off(10, 72)))
        with pytest.raises(MidiError):
            parse_smf(full)

    def test_dense_tempo_map_fast_and_exact(self):
        # tempo index: per-event lookup is O(log T); result matches the
        # definitional per-segment accumulation
        evs = b"".join(tempo(10, 500000 - i * 100) for i in range(500))
        m = parse_smf(smf([evs]))

        def slow_seconds(tick):
            t, last, uspq = 0.0, 0, 500000
            for tt, uu in m.tempos:
                if tt >= tick:
                    break
                t += (tt - last) * uspq * 1e-6 / m.division
                last, uspq = tt, uu
            return t + (tick - last) * uspq * 1e-6 / m.division

        for tick in (0, 5, 10, 15, 2501, 4999, 5000, 9999):
            assert m.seconds(tick) == pytest.approx(slow_seconds(tick),
                                                    rel=1e-12)


class TestTiming:
    def test_default_tempo(self):
        # 480 ticks = 1 quarter at the default 120 bpm = 0.5 s
        m = parse_smf(smf([note_on(0, 60) + note_off(480, 60)]))
        assert m.seconds(480) == pytest.approx(0.5)
        assert m.seconds(240) == pytest.approx(0.25)

    def test_tempo_change_mid_file(self):
        # one quarter at 120 bpm (0.5 s), then tempo doubles to 240 bpm
        # (250000 us/qn): the next quarter lasts 0.25 s
        ev = tempo(0, 500000) + note_on(0, 60) + tempo(480, 250000)
        m = parse_smf(smf([ev]))
        assert m.seconds(480) == pytest.approx(0.5)
        assert m.seconds(960) == pytest.approx(0.75)

    def test_tempo_track_governs_other_tracks(self):
        # format 1: tempo lives in track 0, notes in track 1
        m = parse_smf(smf([tempo(0, 250000), note_on(0, 60) + note_off(480, 60)]))
        songs = midi_songs(smf([tempo(0, 250000),
                                note_on(0, 60) + note_off(480, 60)]))
        assert m.seconds(480) == pytest.approx(0.25)
        (_label, song, _poly), = songs
        assert song[1].t == pytest.approx(0.25)


class TestSongs:
    def test_freq_and_pairing(self):
        data = smf([note_on(0, 69) + note_off(480, 69)
                    + note_on(0, 81) + note_off(480, 81)])
        (_l, song, poly), = midi_songs(data)
        assert poly == 1
        on, off, on2, off2 = song
        assert float(on.params["freq"]) == pytest.approx(440.0)
        assert float(on2.params["freq"]) == pytest.approx(880.0)
        assert on.params["note_on"] and not off.params["note_on"]
        assert on.note_id == off.note_id
        assert on2.note_id == off2.note_id != on.note_id

    def test_retrigger_releases_old_note_first(self):
        # note-on on an already-sounding key: off(old) then on(new), the
        # tracker-column semantics (host/songparse.py:213-219)
        data = smf([note_on(0, 60) + note_on(480, 60) + note_off(480, 60)])
        (_l, song, _p), = midi_songs(data)
        kinds = [(e.params["note_on"], e.note_id) for e in song]
        assert kinds[0] == (True, 1)
        assert kinds[1] == (False, 1)   # old released at the retrigger
        assert kinds[2] == (True, 2)
        assert kinds[3] == (False, 2)

    def test_same_tick_offs_sort_before_ons(self):
        # file order: on(62) then off(60) at the same tick — the song must
        # order the off first (songparse.py:227-229 slot sort)
        ev = (note_on(0, 60) + note_on(480, 62) + note_off(0, 60)
              + note_off(480, 62))
        (_l, song, poly), = midi_songs(smf([ev]))
        # at tick 480 the file orders on(62) before off(60); the song
        # must emit the off first
        assert [e.params["note_on"] for e in song] == [True, False, True, False]
        assert [e.note_id for e in song] == [1, 1, 2, 2]
        assert poly == 1  # off-first keeps peak concurrency at 1

    def test_channel_grouping_and_skip(self):
        ev = (note_on(0, 60, ch=0) + note_on(0, 40, ch=9)
              + note_off(480, 60, ch=0) + note_off(0, 40, ch=9))
        parts = midi_songs(smf([ev]))
        assert {l for l, _s, _p in parts} == {"channel 0", "channel 9"}
        parts = midi_songs(smf([ev]), skip_channels=(9,))
        assert [l for l, _s, _p in parts] == ["channel 0"]

    def test_track_grouping(self):
        data = smf([note_on(0, 60) + note_off(480, 60),
                    note_on(0, 64) + note_off(480, 64)])
        parts = midi_songs(data, group="track")
        assert [l for l, _s, _p in parts] == ["track 0", "track 1"]

    def test_polyphony_measured(self):
        ev = (note_on(0, 60) + note_on(0, 64) + note_on(0, 67)
              + note_off(480, 60) + note_off(0, 64) + note_off(0, 67))
        (_l, _s, poly), = midi_songs(smf([ev]))
        assert poly == 3

    def test_velocity_param(self):
        data = smf([note_on(0, 60, vel=127) + note_off(480, 60)])
        (_l, song, _p), = midi_songs(data, include_velocity=True)
        assert float(song[0].params["velocity"]) == pytest.approx(1.0)
        (_l, song, _p), = midi_songs(data)
        assert "velocity" not in song[0].params

    def test_transpose(self):
        data = smf([note_on(0, 57) + note_off(480, 57)])
        (_l, song, _p), = midi_songs(data, transpose=12)
        assert float(song[0].params["freq"]) == pytest.approx(440.0)

    def test_chronological_for_tracker(self):
        ev = b"".join(note_on(120 * i, 60 + i) + note_off(60, 60 + i)
                      for i in range(8))
        (_l, song, _p), = midi_songs(smf([ev]))
        assert all(song[i].t <= song[i + 1].t for i in range(len(song) - 1))


class TestRender:
    def test_render_end_to_end(self):
        from zang_tpu.host import instruments as ti

        # two channels, a tempo change, chords — a small but real file
        data = smf([
            tempo(0, 400000),
            note_on(0, 60) + note_on(0, 64) + note_off(480, 60)
            + note_off(0, 64) + note_on(0, 67) + note_off(480, 67),
            note_on(0, 36, ch=1) + note_off(960, 36, ch=1),
        ])
        audio = render_midi(
            data, lambda pi, label: ti.NiceInstrument(0.3),
            sample_rate=24000.0, tail=0.5, chunk_size=4096)
        assert audio.shape[0] == 1
        assert audio.shape[1] > 24000  # ~ >1 s of audio
        assert np.isfinite(audio).all()
        assert float(np.abs(audio).max()) > 1e-3  # audible

    def test_empty_file_rejected(self):
        with pytest.raises(MidiError):
            render_midi(smf([b""]), lambda pi, label: None)

    def test_part_and_event_caps(self):
        # group='track' with many minimal tracks: the cap must refuse
        # before any instrument is built or graph traced
        data = smf([note_on(0, 60 + i % 12) + note_off(10, 60 + i % 12)
                    for i in range(20)])
        built = []
        with pytest.raises(MidiError, match="parts"):
            render_midi(data, lambda pi, label: built.append(pi),
                        group="track", max_parts=16)
        assert built == []
        with pytest.raises(MidiError, match="events"):
            render_midi(data, lambda pi, label: built.append(pi),
                        group="track", max_events=30)
        assert built == []


class TestLiveReplay:
    """zang-midi --live: an SMF replayed block-by-block into a LiveServer
    lane over the raw-event wire op (host/midi.py replay_live)."""

    def test_replay_into_live_server(self):
        import time

        from zang_tpu.host import instruments as ti
        from zang_tpu.host.midi import replay_live
        from zang_tpu.serve.client import TerminalPlayer
        from zang_tpu.serve.server import LiveClient, LiveServer

        # two channels -> two parts; an overlapping pair on channel 0
        data = smf([
            tempo(0, 500_000)
            + note_on(0, 60, ch=0) + note_on(240, 64, ch=0)
            + note_off(240, 60, ch=0) + note_off(240, 64, ch=0),
            note_on(120, 48, ch=1) + note_off(480, 48, ch=1),
        ])
        srv = LiveServer(
            lambda: [(ti.NiceInstrument(0.3), 3), (ti.HardSquareInstrument(), 2)],
            48000.0, port=0, initial_lanes=1, realtime=False,
            block_size=1024)
        with srv:
            c = LiveClient(srv.host, srv.port)
            assert c.welcome["num_parts"] == 2
            with TerminalPlayer(c, quiet=True) as player:
                deadline = time.monotonic() + 120
                while (player.blocks_received == 0
                       and time.monotonic() < deadline):
                    time.sleep(0.02)
                assert player.blocks_received > 0, "stream never started"

                class _Locked:
                    welcome = c.welcome

                    @staticmethod
                    def send_event(part, params, note_id=None):
                        with player._lock:
                            player.client.send_event(part, params,
                                                     note_id=note_id)

                n = replay_live(data, _Locked(), rate=8.0)
                assert n == 6  # 3 on/off pairs
                # the replayed notes are audible in the returned stream
                deadline = time.monotonic() + 60
                heard = 0.0
                while time.monotonic() < deadline and heard < 0.01:
                    heard = max(heard, player.level)
                    time.sleep(0.02)
                assert heard > 0.01, heard

    def test_replay_event_order_and_parts(self):
        """Pure pacing/mapping: events arrive chronologically, groups cycle
        over num_parts, numpy params are JSON-plain."""
        import json

        from zang_tpu.host.midi import replay_live

        data = smf([
            note_on(0, 60, ch=0) + note_off(240, 60, ch=0),
            note_on(0, 50, ch=1) + note_off(480, 50, ch=1),
            note_on(0, 40, ch=2) + note_off(480, 40, ch=2),
        ])
        sent = []

        class FakeClient:
            welcome = {"num_parts": 2}

            @staticmethod
            def send_event(part, params, note_id=None):
                json.dumps(params)  # must be wire-serializable
                sent.append((part, params, note_id))

        clock = [0.0]
        n = replay_live(data, FakeClient(), rate=4.0,
                        now=lambda: clock[0],
                        sleep=lambda dt: clock.__setitem__(0, clock[0] + dt))
        assert n == len(sent) == 6
        # three channel groups cycle over two parts: ch0->0, ch1->1, ch2->0
        assert {p for p, _, _ in sent} == {0, 1}
        ons = [(p, prm["freq"]) for p, prm, _ in sent if prm["note_on"]]
        assert len(ons) == 3
        # wall clock advanced to the last event's scaled time
        assert clock[0] > 0.0
