"""Incremental script live planner (script/liveplan.py) vs full re-plan:
bit-exact across envelope/gate/portamento/curve/osc/track/delay sites."""

import os
import random

import numpy as np

from zang_tpu.host.live import LiveSession
from zang_tpu.script.compile import compile_script
from zang_tpu.script.jax_backend import ScriptInstrument

SR = 44100.0
KEYS = "zxcvbnm,.q2w3er5t6y7u"

SIMPLE = """
Simple = defmodule
    freq: constant,
    note_on: boolean,
begin
    env = Envelope(attack=.cubed(0.02), decay=.cubed(0.1),
                   release=.cubed(0.4), sustain_volume=0.6, note_on)
    out SineOsc(freq, phase=0) * env * Gate(note_on)
end
"""

PORTA = """
Porta = defmodule
    freq: constant,
    note_on: boolean,
begin
    f = Portamento(curve=.squared(0.08), goal=freq, note_on,
                   prev_note_on=note_on)
    out (TriSawOsc(freq=220, color=0.4) * 0.1
         + PulseOsc(freq=440, color=0.3) * 0.1
         + SineOsc(freq=f * 1, phase=0))
        * Envelope(attack=.linear(0.01), decay=.linear(0.05),
                   release=.linear(0.3), sustain_volume=0.5, note_on)
end
"""


def _drive(sess, seed, blocks, events_per_block=1):
    rng = random.Random(seed)
    held = {}
    out = []
    for _ in range(blocks):
        for _ in range(events_per_block):
            if rng.random() < 0.75:
                k = rng.choice(KEYS)
                if k in held:
                    sess.key_event(0, k, False, note_ids=held)
                else:
                    sess.key_event(0, k, True, note_ids=held)
        out.append(sess.render_block())
    return np.concatenate(out, axis=1)


def _compare(src, module, seed=0, blocks=40, poly=2, slot_capacity=8,
             events_per_block=1, block_size=1024):
    def make():
        compiled = compile_script(src, filename="<test>")
        return [(ScriptInstrument(compiled, module), poly)]

    os.environ["ZANG_LIVE_INC"] = "1"
    try:
        inc = LiveSession(make(), SR, block_size=block_size,
                          slot_capacity=slot_capacity)
        assert all(p.planner is not None for p in inc.parts)
        a = _drive(inc, seed, blocks, events_per_block)
        os.environ["ZANG_LIVE_INC"] = "0"
        full = LiveSession(make(), SR, block_size=block_size,
                           slot_capacity=slot_capacity)
        assert all(p.planner is None for p in full.parts)
        b = _drive(full, seed, blocks, events_per_block)
    finally:
        os.environ.pop("ZANG_LIVE_INC", None)
    assert np.abs(a).max() > 0
    np.testing.assert_array_equal(a, b)


def test_simple_env_gate_sine():
    _compare(SIMPLE, "Simple")


def test_portamento_and_oscs():
    _compare(PORTA, "Porta", seed=1, poly=1)


def test_reference_script_demo_player():
    """examples/script.txt DemoPlayer: envelope + curve + deftrack +
    delay/feedback + builtin oscillators through the live planner."""
    src = open("/root/reference/examples/script.txt").read()
    _compare(src, "DemoPlayer", seed=2, blocks=50, poly=2,
             slot_capacity=16)


def test_dense_events_and_long_holds():
    _compare(SIMPLE, "Simple", seed=3, blocks=80, poly=3,
             events_per_block=2)
