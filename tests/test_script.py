"""zangscript compiler + JAX backend tests."""

import os

import numpy as np
import pytest

from zang_tpu.core.curves import PaintCurve
from zang_tpu.core.notes import SongEvent
from zang_tpu.core.span import Span
from zang_tpu.core.timeline import compile_timelines
from zang_tpu.graph.fidelity import deviation_dbfs
from zang_tpu.graph.render import Performance, render_performance
from zang_tpu.script import ScriptError, compile_script
from zang_tpu.script import printers
from zang_tpu.script.jax_backend import ScriptInstrument
from zang_tpu.oracle import engine as oe, modules as om

SR = 44100.0

VOICE_SRC = """
Voice = defmodule
    freq: cob,
    note_on: boolean,
begin
    e = Envelope(attack=.cubed(0.05), decay=.cubed(0.1), release=.linear(0.5),
                 sustain_volume=0.8, note_on)
    out e * SineOsc(freq, phase=0)
end
"""


def make_song(n=6, base=220.0):
    song = []
    for i in range(n):
        f = float(np.float32(base * 2 ** (i / 12.0)))
        song.append(SongEvent({"freq": f, "note_on": True}, t=i * 0.3, note_id=i + 1))
        song.append(SongEvent({"freq": f, "note_on": False}, t=i * 0.3 + 0.2, note_id=i + 1))
    return song


def render_script(src, name, song, total, polyphony=1, chunk=8192):
    cs = compile_script(src)
    inst = ScriptInstrument(cs, name)
    tls = compile_timelines(song, polyphony, SR, total)
    return render_performance(Performance([(inst, tls)], SR), total, chunk_size=chunk)[0]


class TestCompiler:
    def test_exports_and_bytecode(self):
        cs = compile_script(VOICE_SRC)
        assert [em.name for em in cs.exported_modules] == ["Voice"]
        mr = cs.codegen_result.module_results[cs.find_module("Voice")]
        assert not mr.is_builtin
        assert mr.num_temps >= 2
        assert [f.module_index for f in mr.fields]  # envelope + sine fields

    def test_diagnostics(self):
        cases = [
            ("M = defmodule x: cob, begin out y end", "undeclared identifier"),
            ("M = defmodule x: nosuchtype, begin out 1 end", "param type"),
            ("M = defmodule begin out Envelope(note_on=true) end",
             "missing param"),
            ("M = defmodule begin out SineOsc(freq=0, phase=0, freq=1) end",
             "more than once"),
            ("M = defmodule begin out feedback end", "within a `delay`"),
            ("M = M2", "undeclared"),
            ("pi = 3", "reserved"),
            ("M = defmodule begin out 1 end\nM = defmodule begin out 2 end",
             "redeclaration"),
        ]
        for src, needle in cases:
            with pytest.raises(ScriptError) as exc_info:
                compile_script(src)
            assert needle in str(exc_info.value), (src, str(exc_info.value))

    def test_global_out_of_order_and_cycles(self):
        # forward reference works
        cs = compile_script("A = defmodule begin out B() end\nB = defmodule begin out 1 end")
        assert len(cs.exported_modules) == 2
        with pytest.raises(ScriptError, match="circular"):
            compile_script("A = B\nB = A")

    def test_dumps(self):
        cs = compile_script(VOICE_SRC)
        p = printers.dump_parse(cs)
        c = printers.dump_codegen(cs)
        assert "module#" in p and "call" in p
        assert "Voice" in c and "call field" in c
        assert "Envelope" in printers.dump_builtins()

    def test_lowered_golden_snapshot(self):
        # the diffable AOT artifact (codegen_zig.zig:461-577 analog): the
        # lowered device IR for VOICE_SRC must match this snapshot exactly
        cs = compile_script(VOICE_SRC)
        expected = """module Voice:
  state sineosc1: phase
  painter envelope0
  scale note: [c0, c1]
  ops:
    painter ambient=note prog=prog_envelope0 -> t1
    copy a=note.c0 -> t2
    osc freq=t2 guard=False kind=SineOsc mode=cumsum phase=note.c1 scale=note site=sineosc1 -> t3
    arith a=t1 arith=mul b=t3 -> +t0
  out: t0
"""
        assert printers.dump_lowered(cs) == expected

    def test_shorthand_and_precedence(self):
        # `note_on` shorthand, operator precedence 1*2+3 = (1*2)+3
        cs = compile_script("""
M = defmodule note_on: boolean, begin
    out Gate(note_on) * 2 + 1
end
""")
        mr = cs.codegen_result.module_results[cs.find_module("M")]
        ops = [i.op for i in mr.instructions]
        assert "call" in ops


class TestBackend:
    def test_env_sine_vs_oracle(self):
        song = make_song()
        total = int(2.5 * SR)
        mix = render_script(VOICE_SRC, "Voice", song, total, polyphony=2)

        class OracleVoice:
            num_outputs, num_temps = 1, 2

            def __init__(self):
                self.env = om.Envelope()
                self.osc = om.SineOsc(mode="parity")

            def paint(self, span, outputs, temps, nic, params):
                sl = slice(span.start, span.end)
                temps[0][sl] = 0.0
                temps[1][sl] = 0.0
                self.env.paint(span, [temps[0]], [], nic, {
                    "sample_rate": params["sample_rate"],
                    "attack": PaintCurve.cubed(0.05),
                    "decay": PaintCurve.cubed(0.1),
                    "release": PaintCurve.linear(0.5),
                    "sustain_volume": 0.8, "note_on": params["note_on"]})
                self.osc.paint(span, [temps[1]], [], nic, {
                    "sample_rate": params["sample_rate"],
                    "freq": params["freq"], "phase": 0.0})
                outputs[0][sl] += temps[0][sl] * temps[1][sl]

        v = oe.Voice(song, 2, OracleVoice,
                     lambda sr, p: {"sample_rate": sr, "freq": p["freq"],
                                    "note_on": p["note_on"]})
        a = oe.render_blocks(lambda s, o, t: v.paint(s, SR, o, t), total,
                             num_temps=2)[0]
        dev = deviation_dbfs(a, mix)
        print(f"\nscript env*sine: rms {dev[0]:.1f} dBFS")
        assert dev[0] < -90.0, dev

    def test_delay_feedback_tail(self):
        src = """
E = defmodule freq: cob, note_on: boolean, begin
    dry = Gate(note_on) * PulseOsc(freq, color=0.5) * 0.3
    out delay 2048 begin
        result = dry + feedback * 0.6
        out result
        feedback Filter(input=result, type=.low_pass, cutoff=0.4, res=0)
    end
end
"""
        song = [SongEvent({"freq": 440.0, "note_on": True}, t=0.0, note_id=1),
                SongEvent({"freq": 440.0, "note_on": False}, t=0.1, note_id=1)]
        total = int(1.0 * SR)
        mix = render_script(src, "E", song, total)
        note_end = int(0.1 * SR)
        # echo repeats every 2048 samples after the burst, decaying by 0.6x
        tail = np.abs(mix[note_end + 1024:]).max()
        assert tail > 1e-3, "echo tail missing"
        e1 = np.abs(mix[2048 + 512: 4096]).max()
        e2 = np.abs(mix[4096 + 512: 6144]).max()
        assert e2 < e1  # decaying

    def test_track_call_pattern(self):
        src = """
Coin = defmodule freq: cob, note_on: boolean, begin
    base_freq = freq
    out from deftrack f: constant, gate: boolean, begin
        0.0 (f=750, gate=true)
        0.045 (f=1000, gate=true)
        0.09 (f=1000, gate=false)
    end, 1 begin
        out Gate(note_on=gate) * SineOsc(freq=base_freq * (f / 1000), phase=0) * 0.5
    end
end
"""
        song = [SongEvent({"freq": 440.0, "note_on": True}, t=0.0, note_id=1),
                SongEvent({"freq": 440.0, "note_on": False}, t=0.3, note_id=1)]
        total = int(0.5 * SR)
        mix = render_script(src, "Coin", song, total)
        assert np.abs(mix[: int(0.045 * SR)]).max() > 0.2
        assert np.abs(mix[int(0.05 * SR): int(0.085 * SR)]).max() > 0.2
        # silent after gate-off
        assert np.abs(mix[int(0.1 * SR): int(0.25 * SR)]).max() < 1e-5

    def test_curve_player(self):
        src = """
CP = defmodule freq_mul: constant, note_on: boolean, begin
    out SineOsc(freq = freq_mul * Curve(curve=defcurve
        0.0 440.0
        0.5 880.0
        1.0 110.0
    end, function=.smoothstep), phase=0) * 0.5
end
"""
        song = [SongEvent({"freq_mul": 1.0, "note_on": True}, t=0.0, note_id=1)]
        total = int(1.2 * SR)
        cs = compile_script(src)
        inst = ScriptInstrument(cs, "CP")
        tls = compile_timelines(song, 1, SR, total)
        mix = render_performance(Performance([(inst, tls)], SR), total,
                                 chunk_size=8192)[0]
        assert np.abs(mix[: int(0.9 * SR)]).max() > 0.3
        # after the last curve node the curve outputs 0 -> frequency 0 ->
        # the sine freezes at a constant DC value (reference behavior too)
        tail = mix[int(1.05 * SR):]
        assert np.std(tail) < 1e-6


class TestEnumTrackParams:
    """Enum/expression-valued track-note args + enum track/exported params
    (reference: any literal arg expression typechecks into track notes,
    codegen.zig:507-545 + 764-774; deftrack grammar parse.zig:292-326)."""

    def _render(self, src, name, song, total, **kw):
        return render_script(src, name, song, total, **kw)

    def test_track_enum_equals_static_label(self):
        # same structure (so site numbering/state keys line up); A drives the
        # filter type from a track param, B hardcodes it — must be identical
        tmpl = """
F = defmodule freq: cob, note_on: boolean, begin
    osc = Gate(note_on) * PulseOsc(freq, color=0.5) * 0.5
    out from deftrack ft: FilterType, begin
        0.0 (ft=.low_pass)
    end, 1 begin
        out Filter(input=osc, type=%s, cutoff=0.25, res=0.3)
    end
end
"""
        song = make_song(n=3)
        total = int(1.0 * SR)
        a = self._render(tmpl % "ft", "F", song, total)
        b = self._render(tmpl % ".low_pass", "F", song, total)
        # identical arithmetic up to XLA fusion reassociation (the mix-weight
        # constants are [V, n] arrays in A, scalars in B): ulp-level only
        assert np.abs(a - b).max() <= 1e-7, np.abs(a - b).max()

    def test_track_enum_filter_type_switches(self):
        src = """
F = defmodule freq: cob, note_on: boolean, begin
    osc = Gate(note_on) * PulseOsc(freq, color=0.5) * 0.5
    out from deftrack ft: FilterType, begin
        0.0 (ft=.low_pass)
        0.25 (ft=.bypass)
        0.5 (ft=.high_pass)
    end, 1 begin
        out Filter(input=osc, type=ft, cutoff=0.25, res=0.3)
    end
end
"""
        plain = """
F = defmodule freq: cob, note_on: boolean, begin
    out Gate(note_on) * PulseOsc(freq, color=0.5) * 0.5
end
"""
        song = [SongEvent({"freq": 220.0, "note_on": True}, t=0.0, note_id=1)]
        total = int(0.75 * SR)
        mix = self._render(src, "F", song, total)
        osc = self._render(plain, "F", song, total)
        assert np.isfinite(mix).all()
        # bypass window: the filter copies its input exactly (state frozen)
        s, e = int(0.3 * SR), int(0.45 * SR)
        assert np.array_equal(mix[s:e], osc[s:e])
        # low-pass window attenuates the pulse's edges vs bypass
        assert np.abs(mix[: int(0.2 * SR)] - osc[: int(0.2 * SR)]).max() > 0.05
        # high-pass window differs from both
        s2 = int(0.55 * SR)
        assert np.abs(mix[s2:] - osc[s2:]).max() > 0.05

    def test_exported_enum_param_note_driven(self):
        tmpl = """
D = defmodule freq: cob, note_on: boolean, %s begin
    out Distortion(input=Gate(note_on) * SineOsc(freq, phase=0) * 0.8,
                   type=%s, ingain=0.6, outgain=0.7, offset=0.1)
end
"""
        total = int(1.2 * SR)
        song = []
        labels = []
        for i in range(4):
            f = float(np.float32(220.0 * 2 ** (i / 12.0)))
            lab = "clip" if i % 2 else "overdrive"
            song.append(SongEvent({"freq": f, "note_on": True, "dist": lab},
                                  t=i * 0.3, note_id=i + 1))
            song.append(SongEvent({"freq": f, "note_on": False, "dist": lab},
                                  t=i * 0.3 + 0.2, note_id=i + 1))
            labels.append(lab)
        dyn = self._render(tmpl % ("dist: DistortionType,", "dist"), "D", song, total)
        od = self._render(tmpl % ("", ".overdrive"), "D", song, total)
        cl = self._render(tmpl % ("", ".clip"), "D", song, total)
        # compose the expected render from the two static ones note-by-note
        expected = od.copy()
        for i, lab in enumerate(labels):
            if lab == "clip":
                s = int(np.float32(i * 0.3) * SR)
                e = int(np.float32((i + 1) * 0.3) * SR) if i < 3 else total
                expected[s:e] = cl[s:e]
        dev = deviation_dbfs(expected, dyn)
        assert dev[0] < -120.0, dev

    def test_track_enum_payload_envelope(self):
        # PaintCurve enum WITH f32 payload as a track note arg
        tmpl = """
V = defmodule freq: cob, note_on: boolean, begin
    e = from deftrack a: PaintCurve, begin
        0.0 (a=%s)
    end, 1 begin
        out Envelope(attack=a, decay=.cubed(0.1), release=.linear(0.3),
                     sustain_volume=0.8, note_on)
    end
    out e * SineOsc(freq, phase=0)
end
"""
        song = [SongEvent({"freq": 330.0, "note_on": True}, t=0.0, note_id=1),
                SongEvent({"freq": 330.0, "note_on": False}, t=0.5, note_id=1)]
        total = int(0.8 * SR)
        a = self._render(tmpl % ".linear(0.02)", "V", song, total)
        b_static = """
V = defmodule freq: cob, note_on: boolean, begin
    e = from deftrack a: PaintCurve, begin
        0.0 (a=.instantaneous)
    end, 1 begin
        out Envelope(attack=.linear(0.02), decay=.cubed(0.1),
                     release=.linear(0.3), sustain_volume=0.8, note_on)
    end
    out e * SineOsc(freq, phase=0)
end
"""
        b = self._render(b_static, "V", song, total)
        assert np.array_equal(a, b)
        # a slow attack really is slower: peak within the first 5 ms is small
        slow = self._render(tmpl % ".linear(0.2)", "V", song, total)
        w = int(0.005 * SR)
        assert np.abs(slow[:w]).max() < 0.5 * np.abs(a[:w]).max()

    def test_track_enum_noise_color(self):
        tmpl = """
N = defmodule note_on: boolean, begin
    out from deftrack c: NoiseColor, begin
        0.0 (c=%s)
    end, 1 begin
        out Gate(note_on) * Noise(color=%s) * 0.3
    end
end
"""
        song = [SongEvent({"note_on": True}, t=0.0, note_id=1)]
        total = 32768
        a = self._render(tmpl % (".pink", "c"), "N", song, total)
        b = self._render(tmpl % (".pink", ".pink"), "N", song, total)
        assert np.array_equal(a, b)
        w = self._render(tmpl % (".white", "c"), "N", song, total)
        assert not np.array_equal(a, w)

    def test_plan_errors_are_clear(self):
        from zang_tpu.script.jax_backend import PlanError

        # exported param of a type that cannot be note-driven
        src = """
M = defmodule c: curve, begin
    out Curve(curve=c, function=.linear)
end
"""
        song = [SongEvent({"note_on": True}, t=0.0, note_id=1)]
        cs = compile_script(src)
        inst = ScriptInstrument(cs, "M")
        tls = compile_timelines(song, 1, SR, 4096)
        with pytest.raises(PlanError, match="cannot be driven from note params"):
            inst.plan(tls, SR)

        # time-varying Curve function label
        src2 = """
M = defmodule note_on: boolean, begin
    out from deftrack fn: InterpolationFunction, begin
        0.0 (fn=.linear)
    end, 1 begin
        out Curve(curve=defcurve
            0.0 0.0
            1.0 1.0
        end, function=fn)
    end
end
"""
        cs2 = compile_script(src2)
        inst2 = ScriptInstrument(cs2, "M")
        with pytest.raises(PlanError, match="cannot vary per note"):
            inst2.plan(tls, SR)


class TestUserBuiltins:
    """Reflection-registered user DSL builtins — the working analog of the
    reference's disabled parse_builtins tool (tools/zangc/parse_builtins.zig,
    zangc.zig:3,99-100)."""

    BASE = """
M = defmodule freq: cob, note_on: boolean, begin
    out %s
end
"""

    def _packages(self, *classes):
        from zang_tpu.script.builtins import user_package
        from zang_tpu.script.compile import builtin_packages

        return builtin_packages() + [user_package(*classes)]

    def _render(self, src, packages, song, total):
        cs = compile_script(src, packages=packages)
        inst = ScriptInstrument(cs, "M")
        tls = compile_timelines(song, 1, SR, total)
        return render_performance(Performance([(inst, tls)], SR), total,
                                  chunk_size=8192)[0]

    def test_register_and_render(self):
        import jax.numpy as jnp

        class Fold:
            PARAMS = [("input", "buffer"), ("amount", float)]

            def render(self, state, inputs, ctx):
                return state, jnp.tanh(inputs["input"] * inputs["amount"])

        song = [SongEvent({"freq": 330.0, "note_on": True}, t=0.0, note_id=1)]
        total = 16384
        pk = self._packages(Fold)
        a = self._render(
            self.BASE % "Fold(input=Gate(note_on) * SineOsc(freq, phase=0), amount=2.5)",
            pk, song, total)
        plain = self._render(
            self.BASE % "Gate(note_on) * SineOsc(freq, phase=0)",
            self._packages(), song, total)
        assert np.allclose(a, np.tanh(plain * 2.5), atol=1e-6)

    def test_stateful_and_dataclass_reflection(self):
        import jax.numpy as jnp

        class Lag:
            """One-pole smoother with reflected Params annotations."""

            class Params:
                input: object  # replaced below
                coeff: float

            def init_state(self, num_voices):
                return {"y": jnp.zeros((num_voices,), jnp.float32)}

            def render(self, state, inputs, ctx):
                import jax

                x = inputs["input"]
                c = inputs["coeff"][..., 0]

                def step(y, xt):
                    y = y + (xt - y) * c
                    return y, y

                y, out = jax.lax.scan(step, state["y"], jnp.moveaxis(x, -1, 0))
                return {"y": y}, jnp.moveaxis(out, 0, -1)

        from zang_tpu.script.builtins import Buffer

        Lag.Params.__annotations__["input"] = Buffer
        song = [SongEvent({"freq": 220.0, "note_on": True}, t=0.0, note_id=1)]
        total = 8192
        out = self._render(
            self.BASE % "Lag(input=Gate(note_on) * SineOsc(freq, phase=0), coeff=0.01)",
            self._packages(Lag), song, total)
        assert np.isfinite(out).all()
        # smoothing attenuates a 220 Hz sine substantially
        plain = self._render(self.BASE % "Gate(note_on) * SineOsc(freq, phase=0)",
                             self._packages(), song, total)
        assert np.abs(out).max() < 0.6 * np.abs(plain).max()

    def test_bad_class_rejected(self):
        from zang_tpu.script.builtins import builtin_from_class

        class NoRender:
            PARAMS = [("x", float)]

        with pytest.raises(TypeError, match="render"):
            builtin_from_class(NoRender)

        class NoParams:
            def render(self, state, inputs, ctx):
                return state, inputs

        with pytest.raises(TypeError, match="PARAMS"):
            builtin_from_class(NoParams)

    def test_cli_add_builtins(self, tmp_path):
        from zang_tpu.script.zangc import main

        user_mod = tmp_path / "my_builtins.py"
        user_mod.write_text(
            "import jax.numpy as jnp\n"
            "class Doubler:\n"
            "    PARAMS = [('input', 'buffer')]\n"
            "    def render(self, state, inputs, ctx):\n"
            "        return state, inputs['input'] * jnp.float32(2.0)\n"
        )
        script = tmp_path / "s.txt"
        script.write_text(self.BASE % "Doubler(input=Gate(note_on))")
        dump = tmp_path / "b.txt"
        rc = main([str(script), "--add-builtins", str(user_mod),
                   "--dump-builtins", str(dump),
                   "-o", str(tmp_path / "gen.py")])
        assert rc == 0
        assert "module Doubler(input: buffer) [user]" in dump.read_text()


class TestZangcCLI:
    def test_cli_compile_and_dumps(self, tmp_path):
        from zang_tpu.script.zangc import main

        script = tmp_path / "test.txt"
        script.write_text(VOICE_SRC)
        out_py = tmp_path / "gen.py"
        rc = main([str(script), "-o", str(out_py),
                   "--dump-parse", str(tmp_path / "p.txt"),
                   "--dump-codegen", str(tmp_path / "c.txt"),
                   "--dump-lowered", str(tmp_path / "l.txt"),
                   "--dump-builtins", str(tmp_path / "b.txt")])
        assert rc == 0
        assert "Voice" in (tmp_path / "c.txt").read_text()
        lowered = (tmp_path / "l.txt").read_text()
        assert lowered.startswith("module Voice:") and "osc" in lowered
        # generated module round-trips
        import importlib.util

        spec = importlib.util.spec_from_file_location("genmod", out_py)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert mod.EXPORTED_MODULES == ["Voice"]
        assert mod.LOWERED_IR == lowered
        inst = mod.make_instrument("Voice")
        assert inst.module_name == "Voice"

    def test_cli_error_exit(self, tmp_path, capsys):
        from zang_tpu.script.zangc import main

        script = tmp_path / "bad.txt"
        script.write_text("M = defmodule begin out nosuch end")
        rc = main([str(script)])
        assert rc == 1
        assert "undeclared" in capsys.readouterr().err


REFERENCE_SCRIPT = "/root/reference/examples/script.txt"


@pytest.mark.skipif(not os.path.exists(REFERENCE_SCRIPT),
                    reason="reference fixture not available")
class TestReferenceScript:
    def test_compiles(self):
        with open(REFERENCE_SCRIPT) as f:
            cs = compile_script(f.read(), filename=REFERENCE_SCRIPT)
        names = [em.name for em in cs.exported_modules]
        assert "DemoPlayer" in names and "CurvePlayer" in names

    def test_demo_player_renders(self):
        with open(REFERENCE_SCRIPT) as f:
            cs = compile_script(f.read(), filename=REFERENCE_SCRIPT)
        inst = ScriptInstrument(cs, "DemoPlayer")
        song = make_song(3)
        total = int(1.5 * SR)
        tls = compile_timelines(song, 1, SR, total)
        mix = render_performance(Performance([(inst, tls)], SR), total,
                                 chunk_size=8192)[0]
        assert np.isfinite(mix).all()
        assert np.abs(mix).max() > 0.01


class TestCompilerRobustness:
    """Malformed input must produce a diagnosed ScriptError (file:line:col +
    caret, the reference's fail.zig behavior) — never a raw traceback."""

    GOOD = """\
Voice = defmodule freq: cob, note_on: boolean, begin
    e = Envelope(attack=.cubed(0.02), decay=.cubed(0.1),
                 release=.cubed(0.5), sustain_volume=0.8, note_on)
    s = PulseOsc(freq, color=0.3) * e
    out delay 11025 begin
        result = s + feedback * 0.5
        out result
        feedback Filter(input=result, type=.low_pass, cutoff=0.2, res=0)
    end
end
"""

    def _expect_script_error_or_ok(self, src):
        from zang_tpu.script.errors import ScriptError

        try:
            compile_script(src)
        except ScriptError as e:
            assert e.message  # diagnosed, with a message
        # a still-valid mutation compiling fine is also acceptable

    @pytest.mark.parametrize("seed", range(40))
    def test_random_mutations_are_diagnosed(self, seed):
        rng = np.random.default_rng(seed)
        src = self.GOOD
        kind = seed % 5
        if kind == 0:  # delete a random span
            i = int(rng.integers(0, len(src) - 10))
            src = src[:i] + src[i + int(rng.integers(1, 10)):]
        elif kind == 1:  # duplicate a random span
            i = int(rng.integers(0, len(src) - 10))
            src = src[:i] + src[i:i + 10] + src[i:]
        elif kind == 2:  # swap two random chars
            a, b = sorted(rng.integers(0, len(src), 2).tolist())
            lst = list(src)
            lst[a], lst[b] = lst[b], lst[a]
            src = "".join(lst)
        elif kind == 3:  # inject garbage tokens
            i = int(rng.integers(0, len(src)))
            src = src[:i] + " @$%^& " + src[i:]
        else:  # truncate
            src = src[: int(rng.integers(1, len(src)))]
        self._expect_script_error_or_ok(src)

    @pytest.mark.parametrize("src,needle", [
        ("M = defmodule begin out nosuch end", "nosuch"),
        ("M = defmodule begin out SineOsc(bogus=1, phase=0) end", "bogus"),
        ("M = defmodule begin out 1 +", ""),
        ("M = defmodule f: curve, begin out Curve(curve=f, function=.nope) end", ""),
        ("M = defmodule begin feedback 1 end", ""),  # feedback outside delay
        ("A = B\nB = A", ""),  # global cycle
    ])
    def test_specific_errors_diagnosed(self, src, needle):
        from zang_tpu.script.errors import ScriptError

        with pytest.raises(ScriptError) as ei:
            compile_script(src)
        if needle:
            assert needle in str(ei.value)


class TestAllBuiltinsRender:
    """Every registered builtin must compile AND render through the JAX
    backend (Decimator used to crash here — per-sample constant params)."""

    SNIPPETS = {
        "trisaw": "M = defmodule freq: cob, note_on: boolean, begin "
                  "out TriSawOsc(freq, color=0.3) * Gate(note_on) end",
        "noise_pink": "M = defmodule freq: cob, note_on: boolean, begin "
                      "out Noise(color=.pink) * Gate(note_on) end",
        "noise_white": "M = defmodule freq: cob, note_on: boolean, begin "
                       "out Noise(color=.white) * 0.5 end",
        "portamento": "M = defmodule freq: constant, note_on: boolean, begin "
                      "f = Portamento(curve=.linear(0.1), goal=freq, note_on, "
                      "prev_note_on=note_on) out SineOsc(freq=f, phase=0) end",
        "decimator": "M = defmodule freq: cob, note_on: boolean, begin "
                     "out Decimator(input=SineOsc(freq, phase=0), "
                     "fake_sample_rate=6000) end",
        "distortion": "M = defmodule freq: cob, note_on: boolean, begin "
                      "out Distortion(input=SineOsc(freq, phase=0), "
                      "type=.clip, ingain=0.9, outgain=0.5, offset=0) end",
        "cycle": "M = defmodule freq: cob, note_on: boolean, begin "
                 "out Cycle(speed=freq) - 0.5 end",
        "filter_hp": "M = defmodule freq: cob, note_on: boolean, begin "
                     "out Filter(input=PulseOsc(freq, color=0.5), "
                     "type=.high_pass, cutoff=0.3, res=0.2) end",
    }

    @pytest.mark.parametrize("name", sorted(SNIPPETS))
    def test_builtin_renders(self, name):
        sr = 44100.0
        total = int(1.0 * sr)
        song = [
            SongEvent({"freq": 440.0, "note_on": True}, t=0.05, note_id=1),
            SongEvent({"freq": 330.0, "note_on": True}, t=0.5, note_id=2),
        ]
        inst = ScriptInstrument(compile_script(self.SNIPPETS[name]), "M")
        tls = compile_timelines(song, 1, sr, total)
        a = np.asarray(render_performance(
            Performance([(inst, tls)], sr), total, chunk_size=8192))
        assert np.isfinite(a).all()
        assert np.abs(a).max() > 1e-4, "silent render"

    def test_builtin_functions_render(self):
        # abs/cos/max/min/pow/sqrt + pi through the full render path
        src = """
M = defmodule freq: cob, note_on: boolean, begin
    s = SineOsc(freq, phase=0)
    a = max(0, s) + min(0, s) - abs(s) * 0.1
    b = pow(abs(s) + 0.1, 2) + sqrt(abs(s)) + cos(s * pi)
    out (a + b * 0.1) * Gate(note_on) * 0.2
end
"""
        sr = 44100.0
        total = 22050
        song = [SongEvent({"freq": 440.0, "note_on": True}, t=0.05, note_id=1)]
        inst = ScriptInstrument(compile_script(src), "M")
        tls = compile_timelines(song, 1, sr, total)
        a = np.asarray(render_performance(
            Performance([(inst, tls)], sr), total, chunk_size=8192))
        assert np.isfinite(a).all() and np.abs(a).max() > 1e-4
