"""Serving-tier protocol fuzz: the TCP live server and the HTTP render
tier parse untrusted bytes with hand-rolled code (serve/server.py frame
loop + hello routing, serve/http.py request handling). A seeded generator
throws malformed hellos, truncated JSON, oversized fields, lying length
headers, binary garbage, and mid-frame disconnects at every parse site;
the invariants asserted are the operational ones:

  - the server process/threads survive every case,
  - an already-attached healthy client KEEPS streaming audio throughout,
  - a fresh client can still attach and play afterward.

Per-case responses are deliberately not asserted (they vary by case:
error frame, silent close, 4xx) — the reference for specific replies is
test_serve_server.py / test_serve_http.py. Slow-marked like the other
serve suites (contention on the 1-core box flakes socket timeouts).
"""

import json
import random
import socket
import struct

import numpy as np
import pytest

from zang_tpu.host import instruments as ti
from zang_tpu.serve.server import LiveClient, LiveServer, MultiInstrumentServer

pytestmark = pytest.mark.slow

SR = 48000.0
BLOCK = 1024

TCP_SEEDS = 150
HELLO_SEEDS = 50
HTTP_SEEDS = 60


# ---------------------------------------------------------------- payloads

def _garbage_line(rng: random.Random) -> bytes:
    n = rng.choice([1, 7, 64, 512, 4096])
    return bytes(rng.randrange(256) for _ in range(n)) + b"\n"


def _truncated_json(rng: random.Random) -> bytes:
    full = json.dumps(_valid_msg(rng)).encode()
    return full[: rng.randrange(1, len(full))] + b"\n"


def _valid_msg(rng: random.Random) -> dict:
    return rng.choice([
        {"op": "event", "part": 0,
         "params": {"freq": 440.0, "note_on": True}, "impulse_frame": 0},
        {"op": "key", "part": 0, "key": "a", "down": True},
        {"op": "stats"},
        {"op": "params", "part": 0},
        {"op": "controller", "part": 0, "name": "x", "value": 0.5},
    ])


def _wrong_types(rng: random.Random) -> bytes:
    msg = _valid_msg(rng)
    key = rng.choice(sorted(msg))
    msg[key] = rng.choice([None, [], {}, "x" * 100, -(2 ** 40), 1e308,
                           float("nan"), {"nested": [1, {"a": None}]}])
    return json.dumps(msg).encode() + b"\n"


def _non_dict(rng: random.Random) -> bytes:
    return json.dumps(rng.choice(
        [17, "hello", [1, 2, 3], None, True, 3.5])).encode() + b"\n"


def _oversized_field(rng: random.Random) -> bytes:
    msg = {"op": rng.choice(["event", "resume", "set_param", "zzz"]),
           "part": 0, "params": {"freq": "A" * rng.choice([10_000, 200_000])},
           "token": "B" * 70_000}
    return json.dumps(msg).encode() + b"\n"


def _bad_restore(rng: random.Random) -> bytes:
    nbytes = rng.choice([-1, 0, 5, 1 << 20, 1 << 40, "ten", None])
    head = json.dumps({"op": "restore", "nbytes": nbytes}).encode() + b"\n"
    # send fewer blob bytes than claimed, then the case closes mid-payload
    return head + b"\x00" * rng.choice([0, 3, 64])


def _weird_ops(rng: random.Random) -> bytes:
    msg = {"op": rng.choice(["", "bye\n", "restore", "snapshot", "resume",
                             "record_start", "record_stop", "set_param",
                             "randomize_params", "\x00", "э" * 30]),
           "token": rng.choice(["", "nope", 12, None]),
           "part": rng.choice([-1, 99, 2 ** 31, "0"]),
           "name": rng.choice(["", "no_such_param", 7]),
           "value": rng.choice(["x", None, 1e308])}
    return json.dumps(msg).encode() + b"\n"


def _binary_noise(rng: random.Random) -> bytes:
    return bytes(rng.randrange(256) for _ in range(rng.choice([2, 100, 9000])))


def _empty_spam(rng: random.Random) -> bytes:
    return b"\n" * rng.choice([1, 50, 2000])


_TCP_CASES = [_garbage_line, _truncated_json, _wrong_types, _non_dict,
              _oversized_field, _bad_restore, _weird_ops, _binary_noise,
              _empty_spam]


def _fire_tcp(host, port, payload: bytes, rng: random.Random) -> None:
    """One fuzz connection: send the payload (maybe in fragments), maybe
    read a little, always disconnect — possibly mid-frame."""
    try:
        s = socket.create_connection((host, port), timeout=2.0)
    except OSError:
        pytest.fail("server stopped accepting connections")
    try:
        s.settimeout(2.0)
        if rng.random() < 0.3 and len(payload) > 4:
            cut = rng.randrange(1, len(payload))
            s.sendall(payload[:cut])
            if rng.random() < 0.5:
                return  # mid-frame disconnect
            s.sendall(payload[cut:])
        else:
            s.sendall(payload)
        if rng.random() < 0.4:
            try:
                s.recv(8192)
            except OSError:
                pass
    except OSError:
        pass  # server closed on us mid-send: a legal response to garbage
    finally:
        try:
            s.close()
        except OSError:
            pass


class TestTcpProtocolFuzz:
    def test_frame_loop_survives_fuzz(self):
        srv = LiveServer(lambda: [(ti.NiceInstrument(0.3), 2)], SR, port=0,
                         initial_lanes=2, realtime=False, block_size=BLOCK,
                         send_timeout=30.0)
        with srv:
            victim = LiveClient(srv.host, srv.port)
            try:
                victim.send_event(0, {"freq": 440.0, "note_on": True})
                assert _read_until_audible(victim) > 100
                for seed in range(TCP_SEEDS):
                    rng = random.Random(seed)
                    payload = _TCP_CASES[seed % len(_TCP_CASES)](rng)
                    _fire_tcp(srv.host, srv.port, payload, rng)
                    # drain the victim so its socket never backs up; its
                    # stream staying alive IS the invariant under test
                    victim.read_block()
                # the victim still hears its own (sustained) note
                assert _read_until_audible(victim) > 100
                # and a fresh client can attach and play
                fresh = LiveClient(srv.host, srv.port)
                try:
                    fresh.send_event(0, {"freq": 330.0, "note_on": True})
                    assert _read_until_audible(fresh) > 100
                finally:
                    fresh.close()
            finally:
                victim.close()


def _hello_payload(rng: random.Random) -> bytes:
    kind = rng.randrange(6)
    if kind == 0:  # malformed first line
        return _garbage_line(rng)
    if kind == 1:  # oversized first frame, no newline (bounded at 64 KiB)
        return b"A" * 70_000
    if kind == 2:  # wrong-instrument hello
        return json.dumps({"op": "hello", "instrument": rng.choice(
            ["nope", "", 7, "n" * 5000, None])}).encode() + b"\n"
    if kind == 3:  # hello with junk fields
        return json.dumps({"op": "hello", "x": "y" * 1000,
                           "instrument": "nice"}).encode() + b"\n"
    if kind == 4:  # non-hello first op (routes to default, frame replayed)
        return _wrong_types(rng)
    return _truncated_json(rng)


class TestHelloRoutingFuzz:
    def test_router_survives_fuzz(self):
        specs = {"nice": {"make_parts": lambda: [(ti.NiceInstrument(0.3), 2)],
                          "sample_rate": SR}}
        srv = MultiInstrumentServer(
            specs, port=0, initial_lanes=1, realtime=False, block_size=BLOCK,
            hello_timeout=1.0, send_timeout=30.0)
        with srv:
            for seed in range(HELLO_SEEDS):
                rng = random.Random(1000 + seed)
                _fire_tcp(srv.host, srv.port, _hello_payload(rng), rng)
            c = LiveClient(srv.host, srv.port, instrument="nice")
            try:
                assert c.welcome["instrument"] == "nice"
                c.send_event(0, {"freq": 440.0, "note_on": True})
                assert _read_until_audible(c) > 100
            finally:
                c.close()


# ------------------------------------------------------------------- HTTP

def _http_payload(rng: random.Random) -> bytes:
    kind = rng.randrange(8)
    if kind == 0:  # not HTTP at all
        return _binary_noise(rng)
    if kind == 1:  # bad request line
        return (b"GET\r\n\r\n" if rng.random() < 0.5 else
                b"FROB /v1/render?example=play HTTP/1.1\r\n"
                b"Host: x\r\n\r\n")
    if kind == 2:  # bad query values
        q = rng.choice([b"seconds=nan", b"seconds=-5", b"seconds=1e309",
                        b"example=" + b"Z" * 9000, b"volume=none",
                        b"example=play&seconds=99999999"])
        return (b"GET /v1/render?" + q + b" HTTP/1.1\r\n"
                b"Host: x\r\nConnection: close\r\n\r\n")
    if kind == 3:  # lying content-length (bigger than body, then close)
        body = b'{"script": "x"'
        return (b"POST /v1/render/script HTTP/1.1\r\nHost: x\r\n"
                b"Content-Type: application/json\r\n"
                + b"Content-Length: %d\r\n\r\n" % (len(body) + 500) + body)
    if kind == 4:  # huge content-length header
        return (b"POST /v1/render/script HTTP/1.1\r\nHost: x\r\n"
                b"Content-Length: 99999999999\r\n\r\n")
    if kind == 5:  # invalid JSON body with honest length
        body = _garbage_line(rng).rstrip(b"\n") or b"{"
        return (b"POST /v1/render/script HTTP/1.1\r\nHost: x\r\n"
                b"Content-Type: application/json\r\n"
                + b"Content-Length: %d\r\n\r\n" % len(body) + body)
    if kind == 6:  # schema-violating JSON (wrong types, huge notes)
        body = json.dumps(rng.choice([
            {"script": 5}, {"script": "x", "notes": "no"},
            {"script": "x", "notes": [[1]] * 50},
            {"script": "x", "notes": [["a", "b", "c"]]},
            {"midi_b64": "!!!not-base64!!!", "instrument": "nice"},
            [], {"params": {"a" * 5000: 1}},
        ])).encode()
        return (b"POST /v1/render/script HTTP/1.1\r\nHost: x\r\n"
                b"Content-Type: application/json\r\n"
                + b"Content-Length: %d\r\n\r\n" % len(body) + body)
    # header spam
    return (b"GET /v1/render?example=play HTTP/1.1\r\nHost: x\r\n"
            + b"X-J: y\r\n" * rng.choice([50, 500])
            + b"Connection: close\r\n\r\n")


class TestHttpProtocolFuzz:
    def test_http_tier_survives_fuzz(self):
        from zang_tpu.serve.http import RenderHTTPServer

        with RenderHTTPServer(port=0, max_seconds=2.0) as srv:
            for seed in range(HTTP_SEEDS):
                rng = random.Random(2000 + seed)
                _fire_tcp(srv.host, srv.port, _http_payload(rng), rng)
            # the tier still serves a real render afterward
            import urllib.request

            with urllib.request.urlopen(
                    f"http://{srv.host}:{srv.port}/v1/render"
                    "?example=play&seconds=1", timeout=300.0) as resp:
                data = resp.read()
            assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
            sr = struct.unpack_from("<I", data, 24)[0]
            assert sr > 0


def _read_until_audible(c, max_blocks=200):
    for _ in range(max_blocks):
        p = float(np.abs(c.read_block()).max())
        if p > 100:
            return p
    raise AssertionError(f"no audible block within {max_blocks}")
