"""Device-side instruments: TPU counterparts of examples/modules.zig.

Each instrument implements the graph.render Instrument protocol:
plan() compiles note timelines into segment tables + envelope programs
(host), render() evaluates the whole chunk for all subvoices in parallel
(device). Audio math follows the reference composites' expression order so
outputs match the oracle bit-tightly.
"""

from typing import List

import numpy as np

import jax.numpy as jnp

from ..core.curves import PaintCurve
from ..core.timeline import SubvoiceTimeline, active_from, pad_step_tables
from ..core import twelve_tet
from ..ops import control, filters, oscillators
from ..ops.control import PainterProgram, TableBank

F32 = np.float32


def _plan_common(timelines, freq_fn, prog):
    """Shared plan pieces: per-segment freq tables + active mask data."""
    starts, freqs = pad_step_tables(timelines, freq_fn)
    prog["freq_starts"] = starts
    prog["freq_values"] = freqs
    prog["active_from"] = active_from(timelines)
    return prog


def _plan_envelope(timelines, sample_rate, bank, env_const, prog):
    segs = [
        control.compile_envelope(tl, bank, sample_rate, lambda p: {**env_const, "note_on": bool(p["note_on"])})
        for tl in timelines
    ]
    pp = PainterProgram.from_lists(segs, timelines[0].total)
    prog["env"] = (pp.starts, pp.a, pp.b, pp.tbase, pp.tmax)
    return prog


def _active(prog, ctx):
    return ctx.t_idx[None, :] >= jnp.asarray(prog["active_from"])[:, None]


def _freq(prog, ctx):
    return control.eval_step_program(
        jnp.asarray(prog["freq_starts"]), jnp.asarray(prog["freq_values"]), ctx.t_idx
    )


def _env(prog, blob, ctx):
    env_prog = tuple(jnp.asarray(x) for x in prog["env"])
    return control.eval_painter_program(env_prog, blob, ctx.t_idx)


class PMOscInstrument:
    """Two-operator phase-mod instrument + ADSR (examples/modules.zig:80-128).

    Pipeline per voice: modulator sine at note freq -> phase input of carrier
    sine at note freq -> multiply by envelope (attack/decay cubed, release
    cubed(release_duration), sustain 0.5).
    """

    def __init__(self, release_duration: float, freq_fn=None) -> None:
        self.release_duration = release_duration
        self.freq_fn = freq_fn or (lambda p: F32(p["freq"]))

    def plan(self, timelines: List[SubvoiceTimeline], sample_rate: float, bank: TableBank):
        prog = _plan_common(timelines, self.freq_fn, {})
        env_const = {
            "attack": PaintCurve.cubed(0.025),
            "decay": PaintCurve.cubed(0.1),
            "release": PaintCurve.cubed(self.release_duration),
            "sustain_volume": 0.5,
        }
        return _plan_envelope(timelines, sample_rate, bank, env_const, prog)

    def init_state(self, num_voices: int):
        z = jnp.zeros((num_voices,), jnp.uint32)
        return {"mod_cnt": z, "car_cnt": z}

    def render(self, state, prog, blob, ctx):
        freq = _freq(prog, ctx)  # [V, n]
        act = _active(prog, ctx)
        mod_cnt, mod = oscillators.sine_osc(
            state["mod_cnt"], freq, 0.0, ctx.sample_rate, act
        )
        car_cnt, car = oscillators.sine_osc(
            state["car_cnt"], freq, mod, ctx.sample_rate, act
        )
        env = _env(prog, blob, ctx)
        return {"mod_cnt": mod_cnt, "car_cnt": car_cnt}, car * env


class NiceInstrument:
    """Pulse -> lowpass -> ADSR (examples/modules.zig:189-248)."""

    def __init__(self, color: float, freq_fn=None) -> None:
        self.color = color
        self.freq_fn = freq_fn or (lambda p: F32(p["freq"]))

    def plan(self, timelines, sample_rate, bank):
        prog = _plan_common(timelines, self.freq_fn, {})
        # per-note cutoff = cutoffFromFrequency(freq * 8, sr), f32 on host
        def cutoff_fn(p):
            freq = self.freq_fn(p)
            f = F32
            v = f(2.0) * (f(1.0) - np.cos(f(np.pi) * f(f(freq) * f(8.0)) / f(sample_rate), dtype=F32))
            return np.sqrt(np.clip(v, f(0.0), f(1.0)), dtype=F32)

        cut_starts, cut_values = pad_step_tables(timelines, cutoff_fn)
        prog["cut_starts"] = cut_starts
        prog["cut_values"] = cut_values
        env_const = {
            "attack": PaintCurve.cubed(0.01),
            "decay": PaintCurve.cubed(0.1),
            "release": PaintCurve.cubed(0.5),
            "sustain_volume": 0.8,
        }
        return _plan_envelope(timelines, sample_rate, bank, env_const, prog)

    def init_state(self, num_voices: int):
        return {
            "cnt": jnp.zeros((num_voices,), jnp.uint32),
            "l": jnp.zeros((num_voices,), jnp.float32),
            "b": jnp.zeros((num_voices,), jnp.float32),
        }

    def render(self, state, prog, blob, ctx):
        freq = _freq(prog, ctx)
        act = _active(prog, ctx)
        cnt, osc = oscillators.pulse_osc(
            state["cnt"], freq, self.color, ctx.sample_rate, act
        )
        osc = osc * jnp.float32(0.5)
        cut = control.eval_step_program(
            jnp.asarray(prog["cut_starts"]), jnp.asarray(prog["cut_values"]), ctx.t_idx
        )
        l, b, filtered = filters.svf_filter(
            state["l"], state["b"], osc, "low_pass", cut, 0.7, act
        )
        env = _env(prog, blob, ctx)
        return {"cnt": cnt, "l": l, "b": b}, env * filtered


class HardSquareInstrument:
    """Pulse gated hard on/off (examples/modules.zig:250-289)."""

    def __init__(self, freq_fn=None) -> None:
        self.freq_fn = freq_fn or (lambda p: F32(p["freq"]))

    def plan(self, timelines, sample_rate, bank):
        prog = _plan_common(timelines, self.freq_fn, {})
        segs = [control.compile_gate(tl) for tl in timelines]
        pp = PainterProgram.from_lists(segs, timelines[0].total)
        prog["gate"] = (pp.starts, pp.a, pp.b, pp.tbase, pp.tmax)
        return prog

    def init_state(self, num_voices: int):
        return {"cnt": jnp.zeros((num_voices,), jnp.uint32)}

    def render(self, state, prog, blob, ctx):
        freq = _freq(prog, ctx)
        act = _active(prog, ctx)
        cnt, osc = oscillators.pulse_osc(
            state["cnt"], freq, 0.5, ctx.sample_rate, act
        )
        gate_prog = tuple(jnp.asarray(x) for x in prog["gate"])
        gate = control.eval_painter_program(gate_prog, blob, ctx.t_idx)
        return {"cnt": cnt}, osc * gate


class FilteredSawtoothInstrument:
    """TriSaw*1.5 -> ADSR multiply -> lowpass (examples/modules.zig:130-187)."""

    def __init__(self, freq_fn=None) -> None:
        self.freq_fn = freq_fn or (lambda p: F32(p["freq"]))

    def plan(self, timelines, sample_rate, bank):
        prog = _plan_common(timelines, self.freq_fn, {})
        env_const = {
            "attack": PaintCurve.cubed(0.025),
            "decay": PaintCurve.cubed(0.1),
            "release": PaintCurve.cubed(1.0),
            "sustain_volume": 0.5,
        }
        _plan_envelope(timelines, sample_rate, bank, env_const, prog)
        f = F32
        cut = filters.cutoff_from_frequency(
            f(f(440.0) * f(twelve_tet.c5)), f(sample_rate)
        )
        prog["cutoff"] = np.float32(cut)
        return prog

    def init_state(self, num_voices: int):
        return {
            "cnt": jnp.zeros((num_voices,), jnp.uint32),
            "l": jnp.zeros((num_voices,), jnp.float32),
            "b": jnp.zeros((num_voices,), jnp.float32),
        }

    def render(self, state, prog, blob, ctx):
        freq = _freq(prog, ctx)
        act = _active(prog, ctx)
        cnt, osc = oscillators.trisaw_osc(
            state["cnt"], freq, 0.0, ctx.sample_rate, act
        )
        osc = osc * jnp.float32(1.5)
        env = _env(prog, blob, ctx)
        pre = osc * env
        l, b, out = filters.svf_filter(
            state["l"], state["b"], pre, "low_pass",
            jnp.float32(prog["cutoff"]), 0.7, act,
        )
        return {"cnt": cnt, "l": l, "b": b}, out
