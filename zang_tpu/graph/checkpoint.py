"""Checkpoint/resume for long renders.

The reference has no checkpointing (SURVEY.md §5 — "resume" is init()).
Here render state is a pytree of small arrays (phase counters, filter l/b,
delay lines), so a render can be checkpointed between chunk segments and
resumed bit-exactly: the chunked design guarantees the continuation is
identical to an uninterrupted render.
"""

import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .render import Performance, RenderCtx


def _flatten_state(state):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return [np.asarray(x) for x in leaves], treedef


def save_checkpoint(path: str, chunk_index: int, state, audio_so_far: np.ndarray):
    leaves, _ = _flatten_state(state)
    np.savez_compressed(
        path,
        chunk_index=np.int64(chunk_index),
        audio=audio_so_far,
        **{f"leaf_{i}": leaf for i, leaf in enumerate(leaves)},
    )


def load_checkpoint(path: str, state_template):
    z = np.load(path)
    _, treedef = _flatten_state(state_template)
    leaves = []
    i = 0
    while f"leaf_{i}" in z:
        leaves.append(jnp.asarray(z[f"leaf_{i}"]))
        i += 1
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return int(z["chunk_index"]), state, z["audio"]


def render_resumable(
    perf: Performance,
    total_frames: int,
    checkpoint_path: str,
    chunk_size: int = 65536,
    segment_chunks: int = 32,
    resume: bool = True,
) -> np.ndarray:
    """Render with periodic checkpoints; resumes from checkpoint_path if it
    exists. Returns f32 [C, total_frames], bit-identical to an
    uninterrupted render_performance call with the same chunk size."""
    xs_np, n_chunks = perf.chunk_xs(total_frames, chunk_size)
    xs = jax.tree_util.tree_map(jnp.asarray, xs_np)

    def step(state, inputs):
        c0, chunk_progs = inputs
        ctx = RenderCtx(perf.sample_rate,
                        c0 + jnp.arange(chunk_size, dtype=jnp.int32), chunk_size)
        return perf.render_chunk(state, chunk_progs, ctx)

    @jax.jit
    def run_segment(state, starts_seg, xs_seg):
        state, chunks = jax.lax.scan(step, state, (starts_seg, xs_seg))
        return state, jnp.moveaxis(chunks, 0, 1).reshape(chunks.shape[1], -1)

    state = perf.init_state()
    start_chunk = 0
    segments = []
    if resume and os.path.exists(checkpoint_path):
        start_chunk, state, audio = load_checkpoint(checkpoint_path, state)
        segments.append(audio)

    starts = np.arange(n_chunks, dtype=np.int32) * chunk_size
    c = start_chunk
    while c < n_chunks:
        e = min(c + segment_chunks, n_chunks)
        xs_seg = jax.tree_util.tree_map(lambda a: a[c:e], xs)
        seg_starts = jnp.asarray(starts[c:e])
        state, audio_seg = run_segment(state, seg_starts, xs_seg)
        segments.append(np.asarray(audio_seg))
        c = e
        save_checkpoint(checkpoint_path, c, state, np.concatenate(segments, axis=1))

    audio = np.concatenate(segments, axis=1)
    return audio[:, :total_frames]
