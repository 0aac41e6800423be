"""Compiler robustness fuzz: malformed zangscript must fail with a
located ScriptError (the reference's fail() contract, fail.zig:6-117),
never an internal exception (IndexError/KeyError/RecursionError...).

Seeded and bounded, so failures reproduce: every case prints its seed.
Mutations run over a corpus of valid scripts (a local composite plus the
reference's examples/script.txt when present) with single-char edits,
truncations, token deletions, and line shuffles — the classes of damage a
human editing a script live (script_runtime hot reload) actually produces.
"""

import os
import random

import pytest

from zang_tpu.script import compile_script
from zang_tpu.script.errors import ScriptError

VALID = """\
f = 0.25
Voice = defmodule freq: cob, note_on: boolean, color: constant, begin
    e = Envelope(attack=.cubed(0.05), decay=.cubed(0.1),
                 release=.linear(0.5), sustain_volume=0.8, note_on)
    o = PulseOsc(freq, color) + TriSawOsc(freq=freq * 0.5, color=0.0) * f
    flt = Filter(input=o, type=.low_pass, res=0.7,
                 cutoff=Curve(curve=curve, function=.smoothstep))
    out delay 11025 begin
        fb = feedback * 0.5
        feedback flt + fb
        out fb + flt
    end * e
end
curve = defcurve
    0.0 0.1
    0.5 0.9
    1.0 0.2
end
"""

CORPUS = [VALID]
_REF = "/root/reference/examples/script.txt"
if os.path.exists(_REF):
    with open(_REF) as f:
        CORPUS.append(f.read())

PRINTABLE = "abcdefghijklmnopqrstuvwxyz0123456789.*+-/=(),:\n \t\"'$%&@#!"


def mutate(src: str, rng: random.Random) -> str:
    kind = rng.randrange(5)
    if not src:
        return "".join(rng.choice(PRINTABLE) for _ in range(20))
    if kind == 0:  # single-char replacement
        i = rng.randrange(len(src))
        return src[:i] + rng.choice(PRINTABLE) + src[i + 1:]
    if kind == 1:  # truncation (mid-token, mid-block)
        return src[: rng.randrange(len(src))]
    if kind == 2:  # delete a word
        words = src.split(" ")
        if len(words) > 1:
            del words[rng.randrange(len(words))]
        return " ".join(words)
    if kind == 3:  # duplicate a line
        lines = src.splitlines()
        i = rng.randrange(len(lines))
        lines.insert(i, lines[i])
        return "\n".join(lines)
    # splice random garbage
    i = rng.randrange(len(src))
    junk = "".join(rng.choice(PRINTABLE) for _ in range(rng.randrange(1, 12)))
    return src[:i] + junk + src[i:]


class TestCompilerFuzz:
    def test_valid_corpus_compiles(self):
        for src in CORPUS:
            compile_script(src)

    @pytest.mark.parametrize("seed", range(6))
    def test_mutations_fail_controlled(self, seed):
        rng = random.Random(1000 + seed)
        for case in range(60):
            src = rng.choice(CORPUS)
            for _ in range(rng.randrange(1, 4)):
                src = mutate(src, rng)
            try:
                compile_script(src)
            except ScriptError as e:
                # located, printable diagnostic (the fail() contract)
                msg = str(e)
                assert "error:" in msg, (seed, case, msg)
            except Exception as e:  # noqa: BLE001 — the assertion target
                raise AssertionError(
                    f"seed={seed} case={case}: internal "
                    f"{type(e).__name__}: {e}\n--- script ---\n{src}")

    def test_pathological_inputs(self):
        cases = [
            "",
            "\n\n\n",
            "=",
            "M = defmodule begin",
            "M = defmodule begin out 1.0 end " * 50,
            "M = defmodule begin out " + "(" * 200 + "1.0" + ")" * 200 + " end",
            "M = defmodule begin out M() end",  # self-recursive module
            "A = B\nB = A",  # global cycle
            "M = defcurve 1.0 0.0 0.5 0.0 end",  # non-increasing t
            "\x00\x01\x02",
            "M = defmodule x: nosuchtype, begin out 1.0 end",
            "M = defmodule begin out 1e999 end",
        ]
        for i, src in enumerate(cases):
            try:
                compile_script(src)
            except ScriptError:
                pass
            except Exception as e:  # noqa: BLE001
                raise AssertionError(
                    f"case {i}: internal {type(e).__name__}: {e}\n{src!r}")

# ---------------------------------------------------------------------------
# Differential fuzz: random VALID scripts, engine vs oracle interpreter.
#
# The generator walks the zangscript grammar (script/parse.py; reference
# src/zangscript/parse.zig) producing well-typed scripts over every builtin
# except Noise (the engine draws threefry tapes the sequential oracle cannot
# reproduce). Renders go through the JAX backend (ScriptInstrument) and the
# bytecode oracle interpreter (oracle/script.py); parity budget is the
# FIDELITY.md render budget.
#
# Structural rules that keep the comparison meaningful (not grammar limits):
#   - oscillator freq inputs come only from bit-exact trajectories (the note
#     freq, vibrato sines, Portamento/Cycle programs) — feeding a Filter or
#     Distortion output into freq would phase-accumulate that module's
#     ulp-level formulation differences into tens of dB, drowning real
#     miscompiles in arithmetic noise;
#   - division only by constants >= 0.5; enum payloads in module-safe ranges.
#
# ZANG_FUZZ_SEEDS=N deepens the sweep (default 24 in the suite; the 200+
# acceptance run is a manual invocation).


class ScriptGen:
    """Random valid-script generator over the zangscript grammar."""

    def __init__(self, rng: random.Random) -> None:
        self.rng = rng
        self.curves = []  # (name, src) top-level defcurves
        self.lets = []  # statements for the root body
        self.n_lets = 0
        self.submodule = None  # (name, src)
        # at most ONE white-noise site per script: the oracle's injected
        # tape (render_script_oracle noise_tapes) is shared by every Noise
        # field, while each engine site draws its own threefry stream
        # keyed by crc32(site) — one site keeps the mapping exact
        self.allow_noise = False

    # -- leaf helpers -------------------------------------------------------

    def const(self, lo, hi, nd=3):
        return f"{self.rng.uniform(lo, hi):.{nd}f}"

    def paint_curve(self, fast=False):
        kind = self.rng.choice(["linear", "squared", "cubed"])
        dur = self.const(0.005, 0.12 if fast else 0.6)
        return f".{kind}({dur})"

    def defcurve(self):
        name = f"c{len(self.curves)}"
        k = self.rng.randrange(3, 6)
        ts = sorted(self.rng.uniform(0.0, 1.5) for _ in range(k))
        ts[0] = 0.0  # anchor at note start: a curve whose span misses the
        # notes entirely renders silence on both sides (vacuous parity)
        pts = []
        last_t = -1.0
        for t in ts:
            if t - last_t < 1e-3:
                t = last_t + 1e-3
            last_t = t
            # curve literals are unsigned numbers (tokenize.py number
            # grammar); values bounded away from 0 so a curve-gated term
            # stays audible
            pts.append(f"    {t:.4f} {self.rng.uniform(0.1, 0.9):.4f}")
        self.curves.append((name, f"{name} = defcurve\n" + "\n".join(pts) + "\nend"))
        return name

    def let(self, expr):
        name = f"a{self.n_lets}"
        self.n_lets += 1
        self.lets.append(f"    {name} = {expr}")
        return name

    # -- typed expression grammar ------------------------------------------

    def freq_expr(self, depth):
        r = self.rng.random()
        if r < 0.40:
            return "freq"
        if r < 0.60:
            return f"freq * {self.const(0.25, 4.0)}"
        if r < 0.75:  # vibrato: shallow sine FM (bit-exact u32 phase)
            rate = self.const(0.5, 8.0)
            eps = self.const(0.002, 0.04)
            return (f"freq * (1 + {eps} * "
                    f"SineOsc(freq={rate}, phase=0))")
        if r < 0.88:  # portamento re-target (painter program, bit-exact)
            goal = self.const(80.0, 1200.0, 1)
            return (f"Portamento(curve={self.paint_curve(fast=True)}, "
                    f"goal={goal}, note_on, prev_note_on=note_on)")
        # cycle phasor scaled into an audio band
        speed = self.const(0.5, 4.0)
        return (f"(Cycle(speed={speed}) * {self.const(50.0, 400.0, 1)} "
                f"+ {self.const(60.0, 300.0, 1)})")

    def control_expr(self, depth):
        """A [0,1]-ish control signal (envelope/gate/curve)."""
        r = self.rng.random()
        if r < 0.5:
            return (f"Envelope(attack={self.paint_curve()}, "
                    f"decay={self.paint_curve()}, "
                    f"release={self.paint_curve()}, "
                    f"sustain_volume={self.const(0.1, 0.95)}, note_on)")
        if r < 0.8:
            return "Gate(note_on)"
        fn = self.rng.choice(["linear", "smoothstep"])
        return f"Curve(function=.{fn}, curve={self.defcurve()})"

    def osc_expr(self, depth):
        r = self.rng.random()
        freq = self.freq_expr(depth)
        if r < 0.4:
            phase = "0"
            if depth > 0 and self.rng.random() < 0.45:
                # phase modulation: offsets don't accumulate, any signal ok
                phase = self.let(self.signal_expr(depth - 1))
            return f"SineOsc(freq={freq}, phase={phase})"
        if r < 0.7:
            return f"PulseOsc(freq={freq}, color={self.const(0.08, 0.92)})"
        return f"TriSawOsc(freq={freq}, color={self.const(0.0, 0.9)})"

    def effect_expr(self, depth):
        inner = self.let(self.signal_expr(depth - 1))
        r = self.rng.random()
        if r < 0.45:
            ftype = self.rng.choice(
                ["low_pass", "band_pass", "high_pass", "notch", "all_pass",
                 "bypass"])
            cutoff = self.const(0.05, 0.7)
            if self.rng.random() < 0.3:  # modulated cutoff (cob)
                cutoff = (f"({cutoff} + {self.const(0.02, 0.2)} * "
                          f"{self.let(self.control_expr(0))})")
            return (f"Filter(input={inner}, type=.{ftype}, "
                    f"cutoff={cutoff}, res={self.const(0.0, 0.9)})")
        if r < 0.7:
            dtype = self.rng.choice(["overdrive", "clip"])
            return (f"Distortion(input={inner}, type=.{dtype}, "
                    f"ingain={self.const(0.3, 1.2)}, "
                    f"outgain={self.const(0.3, 0.8)}, "
                    f"offset={self.const(-0.2, 0.2)})")
        return (f"Decimator(input={inner}, "
                f"fake_sample_rate={self.const(1500.0, 11000.0, 0)})")

    def track_expr(self, depth):
        k = self.rng.randrange(2, 5)
        times = sorted(round(self.rng.uniform(0.0, 0.6), 3) for _ in range(k))
        times = [t + i * 1e-3 for i, t in enumerate(times)]
        rows = "\n".join(
            f"        {t:.4f} (g={self.const(0.2, 1.0)})" for t in times)
        speed = self.rng.choice(["1", "0.5", "2"])
        body = self.let(self.signal_expr(max(0, depth - 1)))
        return (f"from deftrack g: constant, begin\n{rows}\n    end, {speed} "
                f"begin\n        out {body} * g\n    end")

    def delay_expr(self, depth):
        n = self.rng.choice([1024, 4410, 11025])
        g = self.const(0.2, 0.6)
        sig = self.let(self.signal_expr(max(0, depth - 1)))
        return (f"delay {n} begin\n"
                f"        fb = feedback * {g}\n"
                f"        feedback {sig} + fb\n"
                f"        out fb + {sig}\n    end")

    def signal_expr(self, depth):
        if depth <= 0:
            return self.osc_expr(0)
        if self.allow_noise and self.rng.random() < 0.30:
            self.allow_noise = False
            return (f"(Noise(color=.white) * "
                    f"{self.let(self.control_expr(0))})")
        r = self.rng.random()
        if r < 0.30:
            return self.osc_expr(depth)
        if r < 0.50:
            return self.effect_expr(depth)
        if r < 0.62:
            a = self.signal_expr(depth - 1)
            b = self.signal_expr(depth - 1)
            op = self.rng.choice(["+", "-", "*"])
            return f"({a} {op} {b})"
        if r < 0.72:
            return f"({self.signal_expr(depth - 1)} * {self.control_expr(depth)})"
        if r < 0.80:
            return f"({self.signal_expr(depth - 1)} / {self.const(0.5, 3.0)})"
        if r < 0.88:
            return self.track_expr(depth)
        if r < 0.94:
            return self.delay_expr(depth)
        return self.sub_call(depth)

    def sub_call(self, depth):
        if self.submodule is None:
            inner = ScriptGen(self.rng)
            # share the curve list so defcurve numbering stays globally
            # unique: a fresh inner generator restarted at c0 and collided
            # with the outer script's c0 (seed 497: `redeclaration of
            # global c0`). Naming consumes no RNG, so non-colliding seeds
            # generate identical scripts.
            inner.curves = self.curves
            body = inner.root_body(depth=1, n_terms=1)
            self.submodule = (
                "Sub",
                "Sub = defmodule freq: cob, note_on: boolean, begin\n"
                + body + "\nend")
        return f"Sub(freq={self.freq_expr(0)}, note_on)"

    # -- whole scripts ------------------------------------------------------

    def root_body(self, depth, n_terms):
        # first term always audible: osc * control
        terms = [f"{self.let(self.osc_expr(depth))} * "
                 f"{self.let(self.control_expr(depth))}"]
        for _ in range(n_terms - 1):
            terms.append(self.let(self.signal_expr(depth)))
        mix = " + ".join(f"{t} * 0.3" if " " not in t else f"({t}) * 0.3"
                         for t in terms)
        return "\n".join(self.lets) + f"\n    out {mix}"

    def script(self):
        body = self.root_body(depth=self.rng.randrange(1, 4),
                              n_terms=self.rng.randrange(1, 3))
        parts = []
        if self.submodule is not None:
            parts.append(self.submodule[1])
        parts.append(
            "Root = defmodule freq: cob, note_on: boolean, begin\n"
            + body + "\nend")
        parts.extend(src for _, src in self.curves)
        return "\n".join(parts)


class ScriptGenWild(ScriptGen):
    """Tier-2 generator: the UNRESTRICTED well-typed grammar.

    Everything tier 1 deliberately excludes is in here: module outputs
    (filters, distortion, decimators, delays) feeding oscillator freq,
    division by buffers, multiple Noise sites, polyphony up to 4. The
    parity budget is accordingly loose (TIER2_BUDGET_DBFS): once module
    outputs drive freq, ulp-level formulation differences legitimately
    phase-accumulate to tens of dB (FIDELITY.md), so this tier is a
    GROSS-miscompile detector — exactly the class of bug (wrong signal
    routed, wrong path chosen, wrong scale) the round-3 fuzz caught
    inside its envelope.
    """

    NOISE_BUDGET = 3  # one threefry stream per call site, oracle-injected

    def __init__(self, rng: random.Random) -> None:
        super().__init__(rng)
        self.noise_budget = self.NOISE_BUDGET

    def freq_expr(self, depth):
        r = self.rng.random()
        if depth > 0 and r < 0.30:
            # module-output -> freq: the excluded region where the
            # round-3 TriSawOsc buffer-freq miscompile lived
            sig = self.let(self.signal_expr(depth - 1))
            scale = self.const(20.0, 90.0, 1)
            off = self.const(220.0, 700.0, 1)
            return f"({sig} * {scale} + {off})"
        if depth > 0 and r < 0.45:  # arbitrary-signal vibrato
            sig = self.let(self.signal_expr(depth - 1))
            return f"freq * (1 + {self.const(0.005, 0.05)} * {sig})"
        return super().freq_expr(depth)

    def signal_expr(self, depth):
        if depth > 0 and self.noise_budget > 0 and self.rng.random() < 0.25:
            self.noise_budget -= 1
            return (f"(Noise(color=.white) * "
                    f"{self.let(self.control_expr(0))})")
        if depth > 0 and self.rng.random() < 0.12:
            # buffer division (tier 1 divides by constants only); the
            # denominator is a control signal kept away from zero so a
            # correct engine can't blow the budget on x/eps noise
            num = self.signal_expr(depth - 1)
            den = self.let(self.control_expr(0))
            return f"(({num}) / ({den} * 0.5 + {self.const(0.8, 1.5)}))"
        return super().signal_expr(depth)


def _fuzz_song(rng: random.Random):
    from zang_tpu.core.notes import SongEvent

    events = []
    t = 0.05
    nid = 1
    for _ in range(rng.randrange(2, 5)):
        freq = rng.uniform(80.0, 900.0)
        dur = rng.uniform(0.08, 0.4)
        events.append((t, nid, {"freq": freq, "note_on": True}))
        events.append((t + dur, nid, {"freq": freq, "note_on": False}))
        nid += 1
        t += rng.uniform(0.1, 0.35)
    # overlapping notes: releases land after the next press — the stream
    # must still be chronological
    events.sort(key=lambda e: (e[0], e[1]))
    return [SongEvent(p, tt, n) for tt, n, p in events]


def _noise_sites(ops):
    """Engine noise sites in a planned program (recurses into the delay/
    track sub-programs under "inner")."""
    sites = []
    for e in ops:
        if e.get("op") == "noise":
            sites.append(e["site"])
        if "inner" in e:
            sites.extend(_noise_sites(e["inner"]))
    return sites


def _engine_noise_tapes(inst, polyphony: int, total: int, chunk: int):
    """Reproduce the engine's positional white tape(s) per subvoice.

    Mirrors script/jax_backend.py exec_op "noise": per chunk c the tape is
    uniform[0,1) from fold_in(PRNGKey(crc32(site)), c*chunk), shape
    [V, chunk] — threefry is platform-deterministic, so the host draw
    matches the device draw bit-for-bit.

    Returns None (no Noise), [V][total] (one site: legacy shared-tape
    shape), or [V][S][total] (multi-site: one tape per call site, in plan
    order == the oracle's Noise-field construction order).
    """
    import zlib

    import jax
    import jax.numpy as jnp
    import numpy as np

    sites = _noise_sites(inst._ir["ops"])
    if not sites:
        return None

    def site_tape(site):
        key0 = jax.random.PRNGKey(zlib.crc32(site.encode()) & 0x7FFFFFFF)
        cols = []
        for c in range(-(-total // chunk)):
            key = jax.random.fold_in(key0, c * chunk)
            cols.append(np.asarray(jax.random.uniform(
                key, (polyphony, chunk), dtype=jnp.float32)))
        return np.concatenate(cols, axis=1)[:, :total]

    if len(sites) == 1:
        tape = site_tape(sites[0])
        return [tape[v] for v in range(polyphony)]
    tapes = [site_tape(s) for s in sites]
    return [[t[v] for t in tapes] for v in range(polyphony)]


def _run_differential(src: str, song, polyphony: int, seconds: float,
                      sr: float = 44100.0):
    """Render `src` through the engine and the oracle interpreter with the
    same song/polyphony; returns (deviation dBFS, oracle rms)."""
    import numpy as np

    from zang_tpu.core.timeline import compile_timelines
    from zang_tpu.graph.render import Performance, render_performance
    from zang_tpu.oracle.script import render_script_oracle
    from zang_tpu.script.jax_backend import ScriptInstrument

    total = int(seconds * sr)
    cs = compile_script(src)
    inst = ScriptInstrument(cs, "Root")
    tls = compile_timelines(song, polyphony, sr, total)
    engine = render_performance(Performance([(inst, tls)], sr), total,
                                chunk_size=8192)
    noise_tapes = _engine_noise_tapes(inst, polyphony, total, chunk=8192)
    oracle = render_script_oracle(cs, "Root", song, total, sr,
                                  polyphony=polyphony,
                                  noise_tapes=noise_tapes)
    a = np.asarray(engine)
    b = np.asarray(oracle)
    assert a.shape == b.shape
    d = (a - b).astype(np.float64)
    ref = float(np.sqrt(np.mean(b.astype(np.float64) ** 2)))
    dev = 20.0 * np.log10(float(np.sqrt(np.mean(d * d))) + 1e-30)
    return dev, ref


def run_differential_seed(seed: int, seconds: float = 1.2, sr: float = 44100.0):
    """Returns (rms_dbfs deviation, oracle rms, script source)."""
    rng = random.Random(777000 + seed)
    gen = ScriptGen(rng)
    gen.allow_noise = rng.random() < 0.5
    src = gen.script()
    song = _fuzz_song(rng)
    polyphony = rng.choice([1, 1, 2])
    dev, ref = _run_differential(src, song, polyphony, seconds, sr)
    return dev, ref, src


def run_differential_seed_tier2(seed: int, seconds: float = 1.0,
                                sr: float = 44100.0):
    """Tier 2: unrestricted grammar, polyphony up to 4, loose budget.
    Returns (dev, ref, src, song, polyphony) — song/polyphony come back so
    a failure can re-run exact repros through the minimizer."""
    rng = random.Random(888000 + seed)
    gen = ScriptGenWild(rng)
    src = gen.script()
    polyphony = rng.choice([1, 2, 3, 4])
    song = _fuzz_song_wild(rng, polyphony)
    dev, ref = _run_differential(src, song, polyphony, seconds, sr)
    return dev, ref, src, song, polyphony


def _fuzz_song_wild(rng: random.Random, polyphony: int):
    """Denser songs: long overlapping notes actually exercise 3-4 voice
    polyphony (and the dispatcher's steal path when overlap exceeds it)."""
    from zang_tpu.core.notes import SongEvent

    events = []
    t = 0.05
    nid = 1
    for _ in range(rng.randrange(3, 7)):
        freq = rng.uniform(80.0, 900.0)
        dur = rng.uniform(0.15, 0.6)
        events.append((t, nid, {"freq": freq, "note_on": True}))
        events.append((t + dur, nid, {"freq": freq, "note_on": False}))
        nid += 1
        t += rng.uniform(0.04, 0.2)
    events.sort(key=lambda e: (e[0], e[1]))
    return [SongEvent(p, tt, n) for tt, n, p in events]


def minimize_failing_script(src: str, still_fails) -> str:
    """Greedy shrink for red seeds: replace let bindings with `1.0` one at
    a time while the script still fails, to fixpoint. still_fails(src) must
    return True when the candidate still reproduces (compile errors count
    as 'no'). The result prints as a small actionable repro."""
    lines = src.split("\n")
    changed = True
    while changed:
        changed = False
        for i, ln in enumerate(lines):
            s = ln.strip()
            if "=" not in s:
                continue
            name = s.split("=", 1)[0].strip()
            if not (name.startswith("a") and name[1:].isdigit()):
                continue
            if s.split("=", 1)[1].strip() == "1.0":
                continue
            cand = list(lines)
            indent = ln[: len(ln) - len(ln.lstrip())]
            cand[i] = f"{indent}{name} = 1.0"
            try:
                ok = still_fails("\n".join(cand))
            except Exception:  # noqa: BLE001 — a broken candidate is a 'no'
                ok = False
            if ok:
                lines = cand
                changed = True
    return "\n".join(lines)


FUZZ_SEEDS = int(os.environ.get("ZANG_FUZZ_SEEDS", "24"))
FUZZ2_SEEDS = int(os.environ.get("ZANG_FUZZ2_SEEDS", "24"))
# manual deep sweeps only: start both tiers' seed ranges here instead of 0
# (so successive sweeps cover FRESH seeds without re-running recorded ones)
FUZZ_OFFSET = int(os.environ.get("ZANG_FUZZ_OFFSET", "0"))
TIER2_BUDGET_DBFS = -50.0  # gross-miscompile detector (see ScriptGenWild)


class TestDirectedRegressions:
    """Exact repros of bugs the fuzz found — kept fast and unmarked so the
    fast profile guards them forever."""

    def test_const_fed_delay_respects_active_window(self):
        """Tier-2 seed 675 (round 5): a delay body CONSTANT reached the
        feedback line from t=0, so with a late first note every echo
        landed delay-length early vs the sequential reference (-16 dBFS).
        Buffer inputs were already zero pre-window. The fix windows the
        feedback write + body output in exec_delay
        (script/jax_backend.py)."""
        from zang_tpu.core.notes import SongEvent

        src = """Root = defmodule freq: cob, note_on: boolean, begin
    a3 = 1.0
    a4 = delay 4410 begin
        fb = feedback * 0.580
        feedback a3 + fb
        out fb + a3
    end
    a5 = SineOsc(freq=(a1 * 64.3 + 649.4), phase=a4)
    out (a5 * 0.3)
end
""".replace("a1 * ", "")  # const freq; keep the seed's phase-mod shape
        song = [SongEvent({"freq": 440.0, "note_on": True}, t=0.05,
                          note_id=1),
                SongEvent({"freq": 440.0, "note_on": False}, t=0.6,
                          note_id=1)]
        dev, ref = _run_differential(src, song, 1, seconds=1.0)
        assert ref > 1e-5
        assert dev < -90.0, f"const-fed delay window regression: {dev:.1f}"


@pytest.mark.slow
class TestDifferential:
    @pytest.mark.parametrize("seed", range(FUZZ_SEEDS))
    def test_random_script_parity(self, seed):
        dev, ref, src = run_differential_seed(seed)
        assert ref > 1e-5, f"seed {seed}: near-silent render\n{src}"
        assert dev < -90.0, (
            f"seed {seed}: engine vs oracle {dev:.1f} dBFS\n--- script ---\n"
            f"{src}")


@pytest.mark.slow
class TestDifferentialWild:
    @pytest.mark.parametrize("seed", range(FUZZ2_SEEDS))
    def test_unrestricted_script_parity(self, seed):
        dev, ref, src, song, polyphony = run_differential_seed_tier2(seed)
        if ref > 1e-5 and dev < TIER2_BUDGET_DBFS:
            return

        def still_fails(s: str) -> bool:
            d, r = _run_differential(s, song, polyphony, seconds=1.0)
            return r <= 1e-5 or d >= TIER2_BUDGET_DBFS

        small = minimize_failing_script(src, still_fails)
        raise AssertionError(
            f"seed {seed}: engine vs oracle {dev:.1f} dBFS "
            f"(oracle rms {ref:.3g}, polyphony {polyphony})\n"
            f"--- minimized repro ---\n{small}\n--- original ---\n{src}")


if __name__ == "__main__":
    # manual deep sweeps:
    #   ZANG_FUZZ_SEEDS=200 ZANG_FUZZ2_SEEDS=0 python tests/test_script_fuzz.py
    #   ZANG_FUZZ_SEEDS=0 ZANG_FUZZ2_SEEDS=200 python tests/test_script_fuzz.py
    import sys

    bad = 0
    for s in range(FUZZ_OFFSET, FUZZ_OFFSET + FUZZ_SEEDS):
        try:
            dev, ref, src = run_differential_seed(s)
            status = "ok " if (dev < -90.0 and ref > 1e-5) else "BAD"
            if status == "BAD":
                bad += 1
                print(f"--- seed {s} script ---\n{src}")
            print(f"seed {s}: {status} dev {dev:.1f} dBFS ref {ref:.3g}")
        except Exception as e:  # noqa: BLE001 — sweep reporter
            bad += 1
            print(f"seed {s}: ERROR {type(e).__name__}: {e}")
        sys.stdout.flush()
    for s in range(FUZZ_OFFSET, FUZZ_OFFSET + FUZZ2_SEEDS):
        try:
            dev, ref, src, song, poly = run_differential_seed_tier2(s)
            ok = dev < TIER2_BUDGET_DBFS and ref > 1e-5
            if not ok:
                bad += 1
                print(f"--- tier2 seed {s} script (poly {poly}) ---\n{src}")
            print(f"tier2 seed {s}: {'ok ' if ok else 'BAD'} "
                  f"dev {dev:.1f} dBFS ref {ref:.3g} poly {poly}")
        except Exception as e:  # noqa: BLE001 — sweep reporter
            bad += 1
            print(f"tier2 seed {s}: ERROR {type(e).__name__}: {e}")
        sys.stdout.flush()
    sys.exit(1 if bad else 0)
