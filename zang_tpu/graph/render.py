"""Chunked offline renderer: one jitted lax.scan over the whole piece.

The reference renders 1024-sample blocks in a host loop
(examples/write_wav.zig:56-93). Here the *entire* render is a single XLA
program: a lax.scan over chunks (default 65536 samples); within a chunk all
voices and samples are parallel (prefix sums / gather programs / affine
scans), and only tiny per-voice states (phase counters, filter l/b, delay
lines) carry across chunks.

An Instrument provides:
  plan(timelines, sample_rate, bank) -> program dict (numpy arrays; device-
      ready; note-constant params expanded into segment tables)
  init_state(num_voices) -> state pytree
  render(state, prog, blob, ctx) -> (state', audio)
      audio: [V, n] mono per voice — the renderer sums voices (mixdown is
      associative: src/zang/mixdown.zig) — or [C, n] already mixed.

A Performance bundles instruments with their timelines and optional stereo
effect chains.
"""

from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.timeline import SubvoiceTimeline
from ..ops.control import TableBank


@dataclass(frozen=True)
class RenderCtx:
    sample_rate: float  # static
    t_idx: jnp.ndarray  # int32 [n] absolute frame indices for this chunk
    n: int  # static chunk length


class Performance:
    """A set of (instrument, timelines) rendered into one mix.

    post_fn, if given, maps (state, mix [n], ctx) -> (state, audio [C, n])
    and owns any effect state (delays, filters); post_init_state() supplies
    its initial state.
    """

    def __init__(
        self,
        parts: Sequence[Tuple[object, List[SubvoiceTimeline]]],
        sample_rate: float,
        num_channels: int = 1,
        post_fn: Optional[Callable] = None,
        post_init_state: Optional[Callable] = None,
    ) -> None:
        self.parts = list(parts)
        self.sample_rate = float(sample_rate)
        self.num_channels = num_channels
        self.post_fn = post_fn
        self.post_init_state = post_init_state

        bank = TableBank()
        self.programs = []
        for inst, tls in self.parts:
            self.programs.append(inst.plan(tls, self.sample_rate, bank))
        self.blob = bank.blob()

    def init_state(self):
        states = [
            inst.init_state(len(tls)) for inst, tls in self.parts
        ]
        post_state = self.post_init_state() if self.post_init_state else ()
        return (states, post_state)

    def render_chunk(self, state, ctx: RenderCtx):
        states, post_state = state
        blob = jnp.asarray(self.blob)
        mix = jnp.zeros((ctx.n,), jnp.float32)
        new_states = []
        for (inst, _), prog, st in zip(self.parts, self.programs, states):
            st2, audio = inst.render(st, prog, blob, ctx)
            if audio.ndim == 2:  # [V, n] -> sum voices
                mix = mix + jnp.sum(audio, axis=0)
            else:
                mix = mix + audio
            new_states.append(st2)
        if self.post_fn is not None:
            post_state, out = self.post_fn(post_state, mix, ctx)
        else:
            out = mix[None, :] if self.num_channels == 1 else mix
        return (new_states, post_state), out


def render_performance(
    perf: Performance,
    total_frames: int,
    chunk_size: int = 65536,
    jit: bool = True,
) -> np.ndarray:
    """Render the full piece; returns f32 [num_channels, total_frames]."""
    n_chunks = -(-total_frames // chunk_size)

    def step(state, c0):
        ctx = RenderCtx(
            sample_rate=perf.sample_rate,
            t_idx=c0 + jnp.arange(chunk_size, dtype=jnp.int32),
            n=chunk_size,
        )
        state, out = perf.render_chunk(state, ctx)
        return state, out

    def run(state0, starts):
        _, chunks = jax.lax.scan(step, state0, starts)
        # chunks: [n_chunks, C, chunk] -> [C, n_chunks * chunk]
        return jnp.moveaxis(chunks, 0, 1).reshape(chunks.shape[1], -1)

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk_size
    state0 = perf.init_state()
    fn = jax.jit(run) if jit else run
    audio = fn(state0, starts)
    return np.asarray(audio[:, :total_frames])


def make_render_fn(perf: Performance, total_frames: int, chunk_size: int = 65536):
    """Return (fn, args) where fn(state0, starts) renders the whole piece —
    used by bench/compile-check entry points."""
    n_chunks = -(-total_frames // chunk_size)

    def step(state, c0):
        ctx = RenderCtx(
            sample_rate=perf.sample_rate,
            t_idx=c0 + jnp.arange(chunk_size, dtype=jnp.int32),
            n=chunk_size,
        )
        state, out = perf.render_chunk(state, ctx)
        return state, out

    def run(state0, starts):
        _, chunks = jax.lax.scan(step, state0, starts)
        return jnp.moveaxis(chunks, 0, 1).reshape(chunks.shape[1], -1)

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk_size
    return run, (perf.init_state(), starts)
