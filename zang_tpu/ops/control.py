"""Control-rate compiler: envelopes, portamento, gates as gather programs.

The reference's Envelope/Portamento are per-sample state machines driven by a
goal-seeking Painter (src/zang/painter.zig:67-120, src/modules/Envelope.zig:38-108,
src/modules/Portamento.zig:24-48). Their control flow depends only on note
events and note-constant params — never on audio — so on TPU we compile them
host-side into *programs*: sorted segment tables where

    value[t] = a + b * blob[tbase + min(t - start, tmax)]

and `blob` holds f32-exact paint-curve tables (the painter's `t += t_step;
tp = shape(t)` sequence, reproduced bit-for-bit with float32 cumsum). The
device evaluates programs with a searchsorted + gather — fully parallel over
time and voices, bit-identical to the reference's sequential painter.
"""

from dataclasses import dataclass
from functools import lru_cache
from typing import Callable, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.curves import PaintCurve
from ..core.timeline import SubvoiceTimeline

F32 = np.float32

_CURVE_KIND = {"instantaneous": 0, "linear": 1, "squared": 2, "cubed": 3}

# cap on a single paint table (samples). A stage longer than this would need
# ~64MB+; the reference's envelopes are <= a few seconds.
MAX_TABLE = 1 << 24


@lru_cache(maxsize=None)
def _paint_table_cached(kind: str, dur_bits: int, sr_bits: int, t0_bits: int):
    duration = np.uint32(dur_bits).view(np.float32)
    sr = np.uint32(sr_bits).view(np.float32)
    t0 = np.uint32(t0_bits).view(np.float32)
    t_step = F32(F32(1.0) / F32(duration * sr))
    # f32-exact sequential accumulation: t_k = fl(t_{k-1} + t_step), starting
    # from t0, painted while t < 1 (the crossing sample paints with t = 1).
    est = int(np.ceil((1.0 - float(t0)) / max(float(t_step), 1e-30))) + 4
    if est > MAX_TABLE:
        raise ValueError(f"paint table too long ({est} samples)")
    steps = np.full(est + 1, t_step, dtype=np.float32)
    steps[0] = t0
    t = np.cumsum(steps, dtype=np.float32)[1:]  # t after each += t_step
    crossing = np.argmax(t >= 1.0)
    if not t[crossing] >= 1.0:  # never crossed within estimate: extend
        raise ValueError("paint table estimate too short (bug)")
    t = t[: crossing + 1].copy()
    t[-1] = 1.0  # clamp (painter.zig:102-105)
    it = F32(1.0) - t
    if kind == "linear":
        tp = t
    elif kind == "squared":
        tp = F32(1.0) - it * it
    elif kind == "cubed":
        tp = F32(1.0) - it * it * it
    else:
        raise ValueError(kind)
    return np.asarray(t, dtype=np.float32), np.asarray(tp, dtype=np.float32)


def paint_table(kind: str, duration: float, sample_rate: float, t0: float = 0.0):
    """tp sequence for one painter stage; entry k = tp after k+1 steps."""
    return _paint_table_cached(
        kind,
        int(F32(duration).view(np.uint32)),
        int(F32(sample_rate).view(np.uint32)),
        int(F32(t0).view(np.uint32)),
    )


class TableBank:
    """Accumulates paint tables into one flat blob for device gathers.

    blob[0] == 0.0 (shared dummy entry for constant segments).
    """

    def __init__(self) -> None:
        self._chunks: List[np.ndarray] = [np.zeros(1, dtype=np.float32)]
        self._offsets = {}
        self._size = 1

    def add(self, kind: str, duration: float, sample_rate: float, t0: float = 0.0):
        """-> (base offset in blob, length, t sequence, tp sequence)."""
        key = (
            kind,
            int(F32(duration).view(np.uint32)),
            int(F32(sample_rate).view(np.uint32)),
            int(F32(t0).view(np.uint32)),
        )
        if key not in self._offsets:
            t, tp = paint_table(kind, duration, sample_rate, t0)
            self._offsets[key] = (self._size, len(tp), t, tp)
            self._chunks.append(tp)
            self._size += len(tp)
        return self._offsets[key]

    def blob(self) -> np.ndarray:
        return np.concatenate(self._chunks)


@dataclass
class PainterProgram:
    """Per-voice segment tables; value[t] = a + b * blob[tbase + min(dt, tmax)]."""

    starts: np.ndarray  # int32 [V, S] (sorted per voice; padded with total)
    a: np.ndarray  # f32 [V, S]
    b: np.ndarray  # f32 [V, S]
    tbase: np.ndarray  # int32 [V, S]
    tmax: np.ndarray  # int32 [V, S]

    @staticmethod
    def from_lists(segs_per_voice: List[List[tuple]], total: int) -> "PainterProgram":
        S = max(1, max(len(s) for s in segs_per_voice))
        V = len(segs_per_voice)
        starts = np.full((V, S), total, dtype=np.int64)
        a = np.zeros((V, S), dtype=np.float32)
        b = np.zeros((V, S), dtype=np.float32)
        tbase = np.zeros((V, S), dtype=np.int32)
        tmax = np.zeros((V, S), dtype=np.int32)
        for v, segs in enumerate(segs_per_voice):
            for k, (s, av, bv, tb, tm) in enumerate(segs):
                starts[v, k] = s
                a[v, k] = av
                b[v, k] = bv
                tbase[v, k] = tb
                tmax[v, k] = tm
        return PainterProgram(
            starts=starts.astype(np.int32), a=a, b=b, tbase=tbase, tmax=tmax
        )


def eval_painter_program(prog, blob, t_idx):
    """Device: evaluate a PainterProgram at absolute frames t_idx [n] -> [V, n].

    prog fields are device arrays [V, S]; blob [B] f32; t_idx int32 [n].
    """
    starts, a, b, tbase, tmax = prog

    def one(s):
        return jnp.searchsorted(s, t_idx, side="right") - 1

    seg = jax.vmap(one)(starts)  # [V, n]
    seg = jnp.maximum(seg, 0)
    take = lambda arr: jnp.take_along_axis(arr, seg, axis=-1)
    dt = t_idx[None, :] - take(starts)
    idx = take(tbase) + jnp.minimum(dt, take(tmax))
    tp = blob[idx]
    return take(a) + take(b) * tp


def eval_step_program(starts, values, t_idx):
    """Device: piecewise-constant per-sample expansion of note params.

    starts [V, K] int32 sorted (pad with total), values [V, K], t_idx [n].
    Samples before the first segment get values[:, 0].
    """

    def one(s):
        return jnp.searchsorted(s, t_idx, side="right") - 1

    seg = jnp.maximum(jax.vmap(one)(starts), 0)
    return jnp.take_along_axis(values, seg, axis=-1)


# ---------------------------------------------------------------------------
# Painter walk: shared by the envelope and portamento compilers.


class _PainterWalk:
    """Host-side mirror of the Painter state (t position, last/start values),
    emitting program segments instead of painting samples."""

    def __init__(self, bank: TableBank, sample_rate: float) -> None:
        self.bank = bank
        self.sr = sample_rate
        self.t_value = F32(0.0)  # painter.t
        self.finished = False  # painter.t >= 1.0
        self.last = F32(0.0)  # painter.last_value
        self.start = F32(0.0)  # painter.start
        self.table_pos = 0  # samples consumed of current table
        self.table_key = None  # (kind, dur) the current table was built for
        self.table = None  # (base, length, array)
        self.segs: List[tuple] = []

    def new_curve(self) -> None:
        self.start = self.last
        self.t_value = F32(0.0)
        self.finished = False
        self.table_pos = 0
        self.table_key = None
        self.table = None

    def emit(self, s: int, a: F32, b: F32, tbase: int, tmax: int) -> None:
        # merge consecutive constant segments with equal value
        if b == 0.0 and self.segs:
            ps, pa, pb, _, _ = self.segs[-1]
            if pb == 0.0 and pa == a:
                return
        self.segs.append((s, float(a), float(b), tbase, tmax))

    def emit_const(self, s: int, value: float) -> None:
        self.emit(s, F32(value), F32(0.0), 0, 0)

    def paint_flat(self, s: int, e: int, value: float) -> None:
        if e > s:
            self.emit_const(s, value)

    def paint_toward(self, s: int, e: int, curve: PaintCurve, goal: float) -> Tuple[int, bool]:
        """Mirror of painter.zig:67-120. Returns (pos, finished)."""
        goal = F32(goal)
        if self.finished:
            return s, True
        if curve.kind == "instantaneous":
            self.finished = True
            self.t_value = F32(1.0)
            self.last = goal
            return s, True
        key = (curve.kind, F32(curve.duration).tobytes())
        if self.table_key != key:
            # stage (re)parameterized mid-flight: build a table continuing
            # from the current t value
            self.table = self.bank.add(curve.kind, curve.duration, self.sr, float(self.t_value))
            self.table_key = key
            self.table_pos = 0
        base, length, t_arr, tp_arr = self.table
        if self.table_pos >= length:
            self.finished = True
            return s, True
        n = min(length - self.table_pos, e - s)
        if n > 0:
            b = F32(goal - self.start)
            self.emit(s, self.start, b, base + self.table_pos,
                      length - 1 - self.table_pos)
            self.last = F32(self.start + F32(tp_arr[self.table_pos + n - 1] * b))
            self.t_value = F32(t_arr[self.table_pos + n - 1])
            self.table_pos += n
        if self.table_pos >= length:
            self.finished = True
            return s + n, True
        return s + n, False


# ---------------------------------------------------------------------------
# Envelope compiler (src/modules/Envelope.zig state machine).

IDLE, ATTACK, DECAY, SUSTAIN, RELEASE = range(5)


def compile_envelope(
    tl: SubvoiceTimeline,
    bank: TableBank,
    sample_rate: float,
    env_params_fn: Callable[[dict], dict],
) -> List[tuple]:
    """Compile one subvoice's envelope into program segments.

    env_params_fn(note_params) -> dict with keys attack, decay, release
    (PaintCurve), sustain_volume (float), note_on (bool).
    """
    w = _PainterWalk(bank, sample_rate)
    state = IDLE
    w.emit_const(0, 0.0)  # idle before the first note

    def change(new_state):
        nonlocal state
        state = new_state
        w.new_curve()

    for k in range(len(tl.starts)):
        s = int(tl.starts[k])
        e = int(tl.starts[k + 1]) if k + 1 < len(tl.starts) else tl.total
        if e <= s:
            continue
        p = env_params_fn(tl.params[k])
        reset = bool(tl.resets[k])
        pos = s
        if p["note_on"]:
            if reset:
                change(ATTACK)
            if state == IDLE:
                change(ATTACK)
            assert state != RELEASE
            if state == ATTACK:
                pos, fin = w.paint_toward(pos, e, p["attack"], 1.0)
                if fin:
                    change(DECAY if p["sustain_volume"] < 1.0 else SUSTAIN)
            if state == DECAY:
                pos, fin = w.paint_toward(pos, e, p["decay"], p["sustain_volume"])
                if fin:
                    change(SUSTAIN)
            if state == SUSTAIN:
                w.paint_flat(pos, e, p["sustain_volume"])
                pos = e
        else:
            if state == IDLE:
                w.paint_flat(pos, e, 0.0)
            else:
                if state != RELEASE:
                    change(RELEASE)
                pos, fin = w.paint_toward(pos, e, p["release"], 0.0)
                if fin:
                    change(IDLE)
                w.paint_flat(pos, e, 0.0)
    return w.segs


# ---------------------------------------------------------------------------
# Portamento compiler (src/modules/Portamento.zig).


def compile_portamento(
    tl: SubvoiceTimeline,
    bank: TableBank,
    sample_rate: float,
    porta_params_fn: Callable[[dict], dict],
) -> List[tuple]:
    """porta_params_fn(note_params) -> dict with curve (PaintCurve), goal,
    note_on, prev_note_on."""
    w = _PainterWalk(bank, sample_rate)
    w.emit_const(0, 0.0)
    for k in range(len(tl.starts)):
        s = int(tl.starts[k])
        e = int(tl.starts[k + 1]) if k + 1 < len(tl.starts) else tl.total
        if e <= s:
            continue
        p = porta_params_fn(tl.params[k])
        reset = bool(tl.resets[k])
        if p["note_on"] and p.get("prev_note_on", False):
            curve = p["curve"]
        else:
            curve = PaintCurve.instantaneous()
        if p["note_on"] and reset:
            w.new_curve()
        pos, fin = w.paint_toward(s, e, curve, p["goal"])
        if fin:
            w.paint_flat(pos, e, p["goal"])
    return w.segs


# ---------------------------------------------------------------------------
# Gate compiler (src/modules/Gate.zig): 1.0 while note_on else 0.


def compile_gate(tl: SubvoiceTimeline, gate_fn=None) -> List[tuple]:
    gate_fn = gate_fn or (lambda p: bool(p["note_on"]))
    segs = [(0, 0.0, 0.0, 0, 0)]
    for k in range(len(tl.starts)):
        s = int(tl.starts[k])
        v = 1.0 if gate_fn(tl.params[k]) else 0.0
        if segs and segs[-1][1] == v and segs[-1][2] == 0.0:
            continue
        segs.append((s, v, 0.0, 0, 0))
    return segs
