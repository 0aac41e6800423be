"""Checkpoint/resume, keyboard map, cycle parity, compiler golden snapshot."""

import numpy as np
import pytest

import jax.numpy as jnp

from zang_tpu.core.span import Span
from zang_tpu.core.timeline import compile_timelines
from zang_tpu.graph.checkpoint import load_checkpoint, render_resumable
from zang_tpu.graph.render import Performance, render_performance
from zang_tpu.host import instruments as ti
from zang_tpu.host.keyboard import (
    KEY_BINDINGS, get_key_rel_freq, get_key_rel_freq_from_row, keys_to_song,
)

SR = 44100.0


class TestKeyboard:
    def test_layout(self):
        assert len(KEY_BINDINGS) == 39  # the reference's 39 bindings
        # arpeggiator cycling order: ascending within each row (the top row
        # restarts an octave overlap, as in the reference layout)
        for row in (0, 1):
            freqs = [kb.rel_freq for kb in KEY_BINDINGS if kb.row == row]
            assert freqs == sorted(freqs)
        # top row starts one octave up at c4, overlapping the bottom row
        assert get_key_rel_freq_from_row(1, "q") == get_key_rel_freq_from_row(0, ",")
        assert get_key_rel_freq("y") == pytest.approx(1.0)  # a4

    def test_keys_to_song(self):
        song = keys_to_song([(0.0, "z", True), (0.5, "z", False),
                             (0.2, "q", True), (0.7, "q", False)])
        assert len(song) == 4
        assert song[0].t == 0.0 and song[0].params["note_on"]
        # ids pair on/off per key
        ons = {e.note_id for e in song if e.params["note_on"]}
        offs = {e.note_id for e in song if not e.params["note_on"]}
        assert ons == offs


class TestCheckpoint:
    def test_resume_bit_exact(self, tmp_path):
        song = keys_to_song([(0.05, "z", True), (0.4, "z", False),
                             (0.5, "y", True), (0.9, "y", False)])
        total = int(1.5 * SR)
        tls = compile_timelines(song, 2, SR, total)
        perf = Performance([(ti.NiceInstrument(0.25), tls)], SR)
        base = render_performance(perf, total, chunk_size=8192)

        ckpt = str(tmp_path / "render.npz")
        # run the first segments, "crash", then resume
        perf2 = Performance([(ti.NiceInstrument(0.25), tls)], SR)
        audio1 = render_resumable(perf2, total, ckpt, chunk_size=8192,
                                  segment_chunks=3)
        np.testing.assert_array_equal(base, audio1)
        # simulate interruption: drop the checkpoint back two segments by
        # re-rendering from scratch with resume (checkpoint says complete)
        chunk_index, _, audio = load_checkpoint(ckpt, perf2.init_state())
        assert chunk_index == -(-total // 8192)
        perf3 = Performance([(ti.NiceInstrument(0.25), tls)], SR)
        audio2 = render_resumable(perf3, total, ckpt, chunk_size=8192,
                                  segment_chunks=3, resume=True)
        np.testing.assert_array_equal(base, audio2)


class TestCycleParity:
    def test_cycle_u32(self):
        from zang_tpu.oracle import modules as om
        from zang_tpu.ops import oscillators

        n = 4096
        orc = om.Cycle(mode="parity")
        a = np.zeros(n, dtype=np.float32)
        for s in range(0, n, 1024):
            orc.paint(Span(s, s + 1024), [a], [], False,
                      {"sample_rate": SR, "speed": 3.5})
        cnt0 = jnp.zeros((1,), jnp.uint32)
        speed = jnp.full((1, n), jnp.float32(3.5))
        _, out = oscillators.cycle(cnt0, speed, SR)
        np.testing.assert_array_equal(a, np.asarray(out[0]))


GOLDEN_SCRIPT = """
Lead = defmodule freq: cob, note_on: boolean, begin
    e = Envelope(attack=.cubed(0.02), decay=.cubed(0.1), release=.linear(0.4),
                 sustain_volume=0.7, note_on)
    out e * (SineOsc(freq, phase=0) + PulseOsc(freq, color=0.25) * 0.5)
end
"""

GOLDEN_BYTECODE = """\
module#12 Lead: num_temps=4 num_temp_floats=0 fields=[4, 10, 9] delays=[] trackers=[]
  temp0 := call field0 temps=[] (param0, .cubed(0.02), .cubed(0.1), .linear(0.4), 0.7, param2)
  temp1 := cob_to_buffer(param1)
  temp2 := call field1 temps=[] (param0, temp1, 0)
  temp1 := cob_to_buffer(param1)
  temp3 := call field2 temps=[] (param0, temp1, 0.25)
  temp1 := mul(temp3, 0.5)
  temp3 := add(temp2, temp1)
  out0 := mul(temp0w, temp3)
"""


class TestCompilerGolden:
    def test_bytecode_snapshot(self):
        """The reference's golden-compile test pattern (src/zangscript/
        tests.zig:44-92): compile a script and string-compare the full
        generated output."""
        from zang_tpu.script import compile_script
        from zang_tpu.script.printers import dump_codegen

        cs = compile_script(GOLDEN_SCRIPT)
        assert dump_codegen(cs) == GOLDEN_BYTECODE
