"""Device-side instruments: TPU counterparts of examples/modules.zig.

Each instrument implements the graph.render Instrument protocol:
plan() compiles note timelines into segment programs (host): exact u32
phase-counter coefficients for oscillators, closed-form painter programs
for envelopes/gates, piecewise cutoff tables for filters. render()
evaluates a whole chunk for all subvoices in parallel (device) — the
oscillators are *stateless* (phase = A + t*ifreq mod 2^32, bit-identical
to per-sample accumulation); only filter state carries across chunks.

Audio math follows the reference composites' expression order so outputs
match the oracle bit-tightly.
"""

from typing import List

import numpy as np

import jax.numpy as jnp

from ..core.curves import PaintCurve
from ..core.timeline import SubvoiceTimeline, active_from
from ..core import twelve_tet
from ..ops import control, filters, oscillators
from ..ops.segprog import SegProgram, eval_chunk

F32 = np.float32


def default_freq(p):
    """Default note-frequency accessor (params["freq"], f32)."""
    return F32(p["freq"])


def _plan_envelope(timelines, sample_rate, env_const, prog):
    segs = [
        control.compile_envelope(
            tl, sample_rate,
            lambda k, p: {**env_const, "note_on": bool(p["note_on"])},
        )
        for tl in timelines
    ]
    prog["env"] = control.painter_program(segs, timelines[0].total)
    return prog


def _active(prog, ctx):
    return ctx.t_idx[None, :] >= jnp.asarray(prog["active_from"])[:, None]


def _env(prog, ctx):
    return control.eval_painter(eval_chunk(prog["env"], ctx.t_idx), ctx.t_idx)


def _phase(prog, ctx):
    return oscillators.phase_from_chunk(eval_chunk(prog["phase"], ctx.t_idx), ctx.t_idx)


def _live_env_kit(polyphony, sample_rate, freq_fn, env_const,
                  guard_div8=False, extra_fns=None, static=None):
    """LivePlanKit matching the {phase, active_from, env} plan structure
    (host/liveplan.py): O(1) host work per event instead of a full re-plan."""
    from . import liveplan as lp

    def env_fn(k, p, _c=env_const):
        return {**_c, "note_on": bool(p["note_on"])}

    return lp.LivePlanKit(
        {
            "phase": lp.IncPhase(polyphony, sample_rate, freq_fn,
                                 guard_div8=guard_div8, extra_fns=extra_fns),
            "active_from": lp.IncActiveFrom(polyphony),
            "env": lp.IncEnvelope(polyphony, sample_rate, env_fn),
        },
        static=static,
    )


class PMOscInstrument:
    """Two-operator phase-mod instrument + ADSR (examples/modules.zig:80-128).

    Modulator and carrier run at the same note frequency (ratio=1,
    multiplier=1 — examples/modules.zig:110-115), so they share one phase
    counter: carrier = sin(t + sin(t)).
    """

    def __init__(self, release_duration: float, freq_fn=None) -> None:
        self.release_duration = release_duration
        self.freq_fn = freq_fn or default_freq

    def _env_const(self):
        return {
            "attack": PaintCurve.cubed(0.025),
            "decay": PaintCurve.cubed(0.1),
            "release": PaintCurve.cubed(self.release_duration),
            "sustain_volume": 0.5,
        }

    def plan(self, timelines: List[SubvoiceTimeline], sample_rate: float):
        prog = {
            "phase": oscillators.plan_phase_segments(timelines, self.freq_fn, sample_rate),
            "active_from": active_from(timelines),
        }
        return _plan_envelope(timelines, sample_rate, self._env_const(), prog)

    def live_planner(self, polyphony: int, sample_rate: float):
        return _live_env_kit(polyphony, sample_rate, self.freq_fn,
                             self._env_const())

    def init_state(self, num_voices: int):
        return ()

    def render(self, state, prog, ctx):
        cnt, _, _ = _phase(prog, ctx)
        mod = oscillators.sine_wave(cnt, 0.0)
        car = oscillators.sine_wave(cnt, mod)
        env = _env(prog, ctx)  # 0 outside notes -> masks junk phase
        return state, car * env


class NiceInstrument:
    """Pulse -> lowpass -> ADSR (examples/modules.zig:189-248).

    color may be a scalar or a per-voice [V] array — per-voice colors let
    several same-topology parts (e.g. the song's two organs) merge into one
    part, halving kernel invocations per chunk."""

    def __init__(self, color, freq_fn=None) -> None:
        self.color = color
        self.freq_fn = freq_fn or default_freq

    def plan(self, timelines, sample_rate):
        phase = oscillators.plan_phase_segments(
            timelines, self.freq_fn, sample_rate, guard_div8=True
        )

        # per-note cutoff = cutoffFromFrequency(freq * 8, sr), f32 on host;
        # vectorized over segments (scalar np math per segment dominated
        # plan() time at high voice counts)
        f = F32
        cut = np.zeros_like(phase.values["valid"])
        for v, tl in enumerate(timelines):
            k = len(tl.starts)
            if k:
                freqs = tl.param_f32(self.freq_fn)
                x = f(2.0) * (f(1.0) - np.cos(
                    f(np.pi) * (freqs * f(8.0)) / f(sample_rate), dtype=F32))
                cut[v, :k] = np.sqrt(np.clip(x, f(0.0), f(1.0)), dtype=F32)
                cut[v, k:] = cut[v, k - 1]
        phase.values["cut"] = cut

        prog = {"phase": phase, "active_from": active_from(timelines)}
        return _plan_envelope(timelines, sample_rate, self._env_const(), prog)

    def _env_const(self):
        return {
            "attack": PaintCurve.cubed(0.01),
            "decay": PaintCurve.cubed(0.1),
            "release": PaintCurve.cubed(0.5),
            "sustain_volume": 0.8,
        }

    def live_planner(self, polyphony: int, sample_rate: float):
        f = F32

        def cut_fn(p):  # scalar twin of plan()'s vectorized cutoff math
            fr = f(self.freq_fn(p))
            x = f(2.0) * (f(1.0) - np.cos(f(np.pi) * (fr * f(8.0)) / f(sample_rate)))
            return np.sqrt(np.clip(x, f(0.0), f(1.0)))

        return _live_env_kit(polyphony, sample_rate, self.freq_fn,
                             self._env_const(), guard_div8=True,
                             extra_fns={"cut": cut_fn})

    def init_state(self, num_voices: int):
        return {
            "l": jnp.zeros((num_voices,), jnp.float32),
            "b": jnp.zeros((num_voices,), jnp.float32),
        }

    def render(self, state, prog, ctx):
        import os

        act = _active(prog, ctx)
        phase = prog["phase"]
        # table-cut path: hand the filter the piecewise cutoff as boundary
        # tables (ops.filters.svf_filter_table) instead of materializing a
        # [V, n] array — on TPU the Pallas kernel then skips two full HBM
        # streams (cut + act). Requires the tiled chunk format.
        table = (
            isinstance(phase, dict) and "tb" in phase
            and os.environ.get("ZANG_SVF_TABLE", "1") != "0"
        )
        if table:
            vals = eval_chunk(
                {k: v for k, v in phase.items() if k != "cut"}, ctx.t_idx)
        else:
            vals = eval_chunk(phase, ctx.t_idx)
        cnt, ifreq, valid = oscillators.phase_from_chunk(vals, ctx.t_idx)
        color = self.color
        if np.ndim(color) == 1:  # per-voice -> broadcast over samples
            color = jnp.asarray(color, jnp.float32)[:, None]
        osc = oscillators.pulse_wave(cnt, ifreq, color, valid & act)
        osc = osc * jnp.float32(0.5)
        if table:
            l, b, filtered = filters.svf_filter_table(
                state["l"], state["b"], osc, "low_pass",
                phase["tb"], phase["cut"], 0.7, ctx.t_idx[0],
                jnp.asarray(prog["active_from"]),
            )
        else:
            l, b, filtered = filters.svf_filter(
                state["l"], state["b"], osc, "low_pass", vals["cut"], 0.7, act
            )
        env = _env(prog, ctx)
        return {"l": l, "b": b}, env * filtered


class HardSquareInstrument:
    """Pulse gated hard on/off (examples/modules.zig:250-289)."""

    def __init__(self, freq_fn=None) -> None:
        self.freq_fn = freq_fn or default_freq

    def plan(self, timelines, sample_rate):
        gate_segs = [control.compile_gate(tl) for tl in timelines]
        return {
            "phase": oscillators.plan_phase_segments(
                timelines, self.freq_fn, sample_rate, guard_div8=True
            ),
            "active_from": active_from(timelines),
            "gate": control.painter_program(gate_segs, timelines[0].total),
        }

    def live_planner(self, polyphony: int, sample_rate: float):
        from . import liveplan as lp

        return lp.LivePlanKit({
            "phase": lp.IncPhase(polyphony, sample_rate, self.freq_fn,
                                 guard_div8=True),
            "active_from": lp.IncActiveFrom(polyphony),
            "gate": lp.IncGate(polyphony),
        })

    def init_state(self, num_voices: int):
        return ()

    def render(self, state, prog, ctx):
        act = _active(prog, ctx)
        cnt, ifreq, valid = _phase(prog, ctx)
        osc = oscillators.pulse_wave(cnt, ifreq, 0.5, valid & act)
        gate = control.eval_painter(eval_chunk(prog["gate"], ctx.t_idx), ctx.t_idx)
        return state, osc * gate


class FilteredSawtoothInstrument:
    """TriSaw*1.5 -> ADSR multiply -> lowpass (examples/modules.zig:130-187)."""

    def __init__(self, freq_fn=None) -> None:
        self.freq_fn = freq_fn or default_freq

    def plan(self, timelines, sample_rate):
        prog = {
            "phase": oscillators.plan_phase_segments(
                timelines, self.freq_fn, sample_rate, guard_div8=True
            ),
            "active_from": active_from(timelines),
        }
        _plan_envelope(timelines, sample_rate, self._env_const(), prog)
        prog["cutoff"] = self._cutoff(sample_rate)
        return prog

    def _env_const(self):
        return {
            "attack": PaintCurve.cubed(0.025),
            "decay": PaintCurve.cubed(0.1),
            "release": PaintCurve.cubed(1.0),
            "sustain_volume": 0.5,
        }

    def _cutoff(self, sample_rate):
        f = F32
        return np.float32(filters.cutoff_from_frequency(
            f(f(440.0) * f(twelve_tet.c5)), f(sample_rate)
        ))

    def live_planner(self, polyphony: int, sample_rate: float):
        return _live_env_kit(polyphony, sample_rate, self.freq_fn,
                             self._env_const(), guard_div8=True,
                             static={"cutoff": self._cutoff(sample_rate)})

    def init_state(self, num_voices: int):
        return {
            "l": jnp.zeros((num_voices,), jnp.float32),
            "b": jnp.zeros((num_voices,), jnp.float32),
        }

    def render(self, state, prog, ctx):
        act = _active(prog, ctx)
        cnt, ifreq, valid = _phase(prog, ctx)
        osc = oscillators.trisaw_wave(cnt, ifreq, 0.0, valid & act)
        osc = osc * jnp.float32(1.5)
        env = _env(prog, ctx)
        pre = osc * env
        l, b, out = filters.svf_filter(
            state["l"], state["b"], pre, "low_pass",
            jnp.float32(prog["cutoff"]), 0.7, act,
        )
        return {"l": l, "b": b}, out


class SquareWithEnvelope:
    """Pulse x ADSR (examples/modules.zig:291-337).

    Dead code in the reference: no example imports it and its Params use a
    pre-PaintCurve Envelope API (plain durations), so it does not compile
    there. Implemented here against the current Envelope semantics with
    linear curves as the natural reading of bare durations. `weird` picks
    pulse color 0.3 instead of 0.5 (modules.zig:324)."""

    def __init__(self, weird: bool = False, freq_fn=None) -> None:
        self.weird = weird
        self.freq_fn = freq_fn or default_freq

    def plan(self, timelines, sample_rate):
        prog = {
            "phase": oscillators.plan_phase_segments(
                timelines, self.freq_fn, sample_rate, guard_div8=True
            ),
            "active_from": active_from(timelines),
        }
        env_const = {
            "attack": PaintCurve.linear(0.01),
            "decay": PaintCurve.linear(0.1),
            "release": PaintCurve.linear(0.5),
            "sustain_volume": 0.5,
        }
        return _plan_envelope(timelines, sample_rate, env_const, prog)

    def init_state(self, num_voices: int):
        return ()

    def render(self, state, prog, ctx):
        act = _active(prog, ctx)
        cnt, ifreq, valid = _phase(prog, ctx)
        osc = oscillators.pulse_wave(
            cnt, ifreq, 0.3 if self.weird else 0.5, valid & act
        )
        return state, osc * _env(prog, ctx)
