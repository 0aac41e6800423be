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
