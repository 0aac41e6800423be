"""Live serving fleet: many concurrent interactive sessions, one device step.

The live-tier analog of serve/batch.py's shared-graph renderer. serve/batch
amortizes one COMPILE across N songs; LiveFleet amortizes one DISPATCH (and
one compile) across N concurrent live sessions per chip: every lane's
per-block program windows have identical shapes (same instrument spec, same
slot capacity), so the per-session block step (host/live.py) vmaps over a
leading lane axis and the whole fleet renders each block in a single jitted
call. The reference has no serving tier at all (single-process SDL host,
examples/example.zig); this is the TPU-native scale-out of its audio
callback.

Host state (queues, dispatchers, triggers, incremental planners, frame
clocks) stays per lane — lanes take events independently and may start at
different times (t_idx is per-lane data). Device state lives STACKED on the
lane axis between blocks, so steady-state per-block host work is N window
extractions (O(slot_capacity) each, via host/liveplan.py) plus one dispatch.

Constraints: all lanes share one instrument spec (the parts factory is
called once per lane so instruments carry no cross-lane state), one block
size, one sample rate, and one slot capacity (growth is fleet-wide — a
dense block on any lane re-jits the shared step once). A lane can be
reset in place (fresh queues/planners/state) without touching the others.

Multi-chip: pass a 1-axis `mesh` and the lane axis shards over it — lanes
are independent, so GSPMD partitions the step with zero collectives and
ONE dispatch drives every chip (num_lanes must be a multiple of the mesh
size).

Double-buffering: render_block_async() dispatches a block and returns the
device array without downloading it — the carried state stays on device, so
a server can dispatch block N+1 before fetching block N and hide the tunnel
round-trip behind compute (one extra block of output latency).

Elasticity: attach_lane()/detach_lane() admit and remove sessions from a
running fleet; growth doubles the slot count with one re-trace. With
prewarm=True the next growth size compiles in a background thread, so an
attach's first block hits the jit cache (~44 ms) instead of compiling on
the serving path (~3 s measured on the remote chip).
"""

import threading
from typing import Callable, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..host.live import LiveSession


class LiveFleet:
    """N concurrent live sessions rendered by one vmapped device step.

    make_parts: () -> [(instrument, polyphony)] — called once per lane;
    session_kwargs pass through to each LiveSession (block_size,
    num_channels, post_fn/post_init_state factories, slot caps...).

    pcm16_volume: when set, the step mixes down to i16 PCM ON DEVICE
    (core.mixdown semantics, mixdown.zig:8-24 clamp/NaN rules) at that
    volume and render_block returns int16 — halving the per-block download
    on the RTT-bound serving path, exactly what a PCM-streaming server
    ships anyway (serve/batch.py does the same for WAV delivery).
    """

    def __init__(
        self,
        make_parts: Callable[[], Sequence],
        num_lanes: int,
        sample_rate: float,
        mesh: Optional[Mesh] = None,
        mesh_axis: str = "lanes",
        prewarm: bool = False,
        pcm16_volume: Optional[float] = None,
        **session_kwargs,
    ) -> None:
        if num_lanes < 1:
            raise ValueError("num_lanes must be >= 1")
        if mesh is not None:
            n_dev = int(mesh.devices.size)
            if num_lanes % n_dev:
                raise ValueError(
                    f"num_lanes={num_lanes} must be a multiple of the mesh "
                    f"size ({n_dev}) to shard the lane axis")
        self._mesh = mesh
        self._mesh_axis = mesh_axis
        self._make_parts = make_parts
        self._sample_rate = float(sample_rate)
        self._session_kwargs = dict(session_kwargs)
        self.lanes: List[LiveSession] = [
            self._new_session() for _ in range(num_lanes)
        ]
        self._step = None
        self._step_capacity = None
        self._pack = None
        self._states = None  # per-part states, leaves stacked [L, ...]
        self._post_state = None  # stacked [L, ...]
        self._pending_reset: List[int] = []
        self._free: set = set()  # detached lane slots, reusable by attach
        self._lock = threading.Lock()
        self._prewarm = bool(prewarm)
        self._pcm16_volume = (
            None if pcm16_volume is None else float(pcm16_volume))
        self._warm_thread: Optional[threading.Thread] = None

    # -- lane management ---------------------------------------------------

    @property
    def num_lanes(self) -> int:
        return len(self.lanes)

    @property
    def active_lanes(self) -> List[int]:
        return [i for i in range(len(self.lanes)) if i not in self._free]

    def _new_session(self) -> LiveSession:
        return LiveSession(self._make_parts(), self._sample_rate,
                           **self._session_kwargs)

    def reset_lane(self, lane: int) -> None:
        """Replace a lane with a fresh session (fresh queues, planners,
        clock); its stacked device state re-initializes on the next block.
        Other lanes are untouched."""
        with self._lock:
            self.lanes[lane] = self._new_session()
            self._pending_reset.append(lane)

    # -- elastic attach/detach ---------------------------------------------

    def attach_lane(self) -> int:
        """Admit a new session to a running fleet; returns its lane id.

        Reuses a detached slot when one is free; otherwise the fleet GROWS
        (doubling, in mesh-size multiples when sharded). Growth re-stacks
        device state and the next block pays one re-trace of the step for
        the new lane count — existing lanes render through it unaffected."""
        with self._lock:
            if self._free:
                return self._free.pop()
        grow_by = max(1, len(self.lanes))
        if self._mesh is not None:
            n_dev = int(self._mesh.devices.size)
            grow_by = -(-grow_by // n_dev) * n_dev
        first_new = len(self.lanes)
        new_sessions = [self._new_session() for _ in range(grow_by)]
        with self._lock:
            self.lanes.extend(new_sessions)
            self._sync_capacity()
            if self._states is not None:
                per_lane = []
                for s in new_sessions:
                    s._ensure_states()
                    per_lane.append(([p.dev_state for p in s.parts],
                                     s.post_state))
                states, posts = zip(*per_lane)
                tail = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                              *states)
                post_tail = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                                   *posts)
                self._states = self._lane_shard(jax.tree_util.tree_map(
                    lambda a, b: jnp.concatenate([a, b]), self._states, tail))
                self._post_state = self._lane_shard(jax.tree_util.tree_map(
                    lambda a, b: jnp.concatenate([a, b]),
                    self._post_state, post_tail))
            self._free.update(range(first_new + 1, first_new + grow_by))
        if self._prewarm:
            self._prewarm_async(2 * len(self.lanes))
        return first_new

    # -- lane migration (snapshot/restore) -----------------------------------

    def snapshot_lane(self, lane: int) -> bytes:
        """Capture one lane's complete session state — host walks plus its
        slice of the fleet's STACKED device state — as a blob restorable on
        another fleet with the same instrument spec (host/snapshot.py).
        Serving use: drain a server, rebalance lanes across chips, or
        survive a restart without killing the session. Not safe concurrent
        with render_block — callers serialize (LiveServer holds its lock)."""
        self._check_attached(lane)
        sess = self.lanes[lane]
        with self._lock:
            pending = lane in self._pending_reset
        if self._states is None or pending:
            # no stacked state yet (or a reset/restore is pending insertion):
            # the truth is in the session itself
            return sess.snapshot()
        dev = jax.tree_util.tree_map(
            lambda x: np.asarray(x[lane]), self._states)
        post = jax.tree_util.tree_map(
            lambda x: np.asarray(x[lane]), self._post_state)
        return sess.snapshot(dev_override=(dev, post))

    def restore_lane(self, lane: int, blob: bytes) -> None:
        """Replace a lane with a restored session (the migration receive
        side); the lane continues the captured stream bit-exactly on the
        next block. Accepts an attached or detached lane slot; slot
        capacity synchronizes fleet-wide (one re-trace if it grew)."""
        s = self._new_session()
        s.restore(blob)
        with self._lock:
            self.lanes[lane] = s
            self._free.discard(lane)
            self._pending_reset.append(lane)
        self._sync_capacity()

    def detach_lane(self, lane: int) -> None:
        """Remove a session from the fleet; the slot renders silence and is
        reused by the next attach_lane. The fleet never shrinks (shrinking
        would re-trace for no throughput gain)."""
        if lane in self._free:
            raise ValueError(f"lane {lane} is already detached")
        self.reset_lane(lane)
        with self._lock:
            self._free.add(lane)

    def _check_attached(self, lane: int) -> None:
        if lane in self._free:
            raise ValueError(f"lane {lane} is detached — attach_lane() first")

    # -- warmup (compile ahead of need) ------------------------------------

    def _dummy_inputs(self, lane_count: int):
        """[lane_count]-shaped step inputs from a throwaway fresh session —
        shapes depend only on the shared instrument spec + slot capacity,
        so compiling with these warms the jit cache for real blocks."""
        s = self._new_session()
        s.slot_capacity = self.lanes[0].slot_capacity
        f0, f1 = s._host_block()
        window = s._window_progs(f0, f1)
        s._ensure_states()
        rep = lambda x: jnp.broadcast_to(
            jnp.asarray(x)[None], (lane_count,) + jnp.shape(jnp.asarray(x)))
        states = jax.tree_util.tree_map(
            rep, [p.dev_state for p in s.parts])
        post = jax.tree_util.tree_map(rep, s.post_state)
        packed = np.repeat(self._pack([(f0, f1)], [window]), lane_count,
                           axis=0)
        return (self._lane_shard(states), self._lane_shard(post),
                self._lane_shard(jnp.asarray(packed)))

    def warmup(self, lane_counts: Optional[Sequence[int]] = None) -> None:
        """Compile the block step for the given lane counts (default: the
        current count) before any real block needs it. Blocks until done."""
        counts = list(lane_counts) if lane_counts is not None \
            else [self.num_lanes]
        if self._step is None or \
                self._step_capacity != self.lanes[0].slot_capacity:
            s = self._new_session()
            s.slot_capacity = self.lanes[0].slot_capacity
            f0, f1 = s._host_block()
            self._build_step(jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *[s._window_progs(f0, f1)]))
        for count in counts:
            states, post, packed = self._dummy_inputs(count)
            out = self._step(states, post, packed)
            jax.tree_util.tree_leaves(out)[0].block_until_ready()

    def _prewarm_async(self, lane_count: int) -> None:
        """Warm the NEXT growth size in the background so a future
        attach_lane's re-trace hits the jit cache instead of compiling
        on the serving path."""
        if self._warm_thread is not None and self._warm_thread.is_alive():
            return

        def work():
            try:
                self.warmup([lane_count])
            except Exception:  # noqa: BLE001 — warmup is advisory only
                pass

        self._warm_thread = threading.Thread(target=work, daemon=True)
        self._warm_thread.start()

    def close(self, timeout: Optional[float] = None) -> None:
        """Join any in-flight background warmup. Call before process exit
        in short-lived scripts — tearing down the runtime while a daemon
        warmup thread is inside a device call aborts noisily (long-lived
        servers never hit this)."""
        if self._warm_thread is not None:
            self._warm_thread.join(timeout=timeout)

    # -- event input (delegates) ------------------------------------------

    def push_event(self, lane: int, part: int, params: dict,
                   note_id: Optional[int] = None,
                   impulse_frame: int = 0) -> int:
        self._check_attached(lane)
        return self.lanes[lane].push_event(part, params, note_id,
                                           impulse_frame)

    def key_event(self, lane: int, part: int, key: str, down: bool,
                  **kw) -> Optional[int]:
        self._check_attached(lane)
        return self.lanes[lane].key_event(part, key, down, **kw)

    def push_controller(self, lane: int, part: int, name: str,
                        value: float) -> None:
        """Continuous-controller move (mouse path) for one lane."""
        self._check_attached(lane)
        self.lanes[lane].push_controller(part, name, value)

    # -- live parameters (delegates; host/params.py) -------------------------
    # The per-lane f32 device vector is a leaf of the lane's program window,
    # so it rides the fleet's single packed per-block upload — a param
    # change on one lane re-jits nothing and costs the other lanes nothing.

    def param_specs(self, lane: int, part: int = 0) -> list:
        self._check_attached(lane)
        return self.lanes[lane].param_specs(part)

    def get_params(self, lane: int, part: int = 0) -> dict:
        self._check_attached(lane)
        return self.lanes[lane].get_params(part)

    def set_param(self, lane: int, part: int, name: str, value: int) -> int:
        self._check_attached(lane)
        return self.lanes[lane].set_param(part, name, value)

    def step_param(self, lane: int, part: int, name: str, delta: int) -> int:
        self._check_attached(lane)
        return self.lanes[lane].step_param(part, name, delta)

    def randomize_params(self, lane: int, part: int = 0, rng=None) -> dict:
        self._check_attached(lane)
        return self.lanes[lane].randomize_params(part, rng=rng)

    # -- block rendering ---------------------------------------------------

    def _sync_capacity(self) -> int:
        cap = max(s.slot_capacity for s in self.lanes)
        for s in self.lanes:
            s.slot_capacity = cap
        return cap

    def _collect_windows(self):
        """Host halves for every lane with fleet-wide capacity policy."""
        spans = [s._host_block() for s in self.lanes]
        self._sync_capacity()
        while True:
            try:
                windows = [
                    s._window_progs(f0, f1)
                    for s, (f0, f1) in zip(self.lanes, spans)
                ]
                return spans, windows
            except RuntimeError as e:
                if "slot_capacity" not in str(e):
                    raise
                ref = self.lanes[0]
                if ref.slot_capacity < ref.max_slot_capacity:
                    grown = min(ref.slot_capacity * 2, ref.max_slot_capacity)
                    for s in self.lanes:
                        s.slot_capacity = grown
                    continue
                windows = []
                for s, (f0, f1) in zip(self.lanes, spans):
                    try:
                        windows.append(s._window_progs(f0, f1))
                    except RuntimeError as e2:
                        if "slot_capacity" not in str(e2):
                            raise
                        windows.append(s._degraded_window_progs(f0, f1))
                return spans, windows

    def _lane_shard(self, tree):
        """Place every leaf with its leading (lane) axis sharded over the
        mesh; lanes never interact, so this is pure GSPMD annotation — no
        collectives in the compiled step (SURVEY.md §2f comm-backend row)."""
        if self._mesh is None:
            return tree

        def put(x):
            x = jnp.asarray(x)
            spec = P(self._mesh_axis, *([None] * (x.ndim - 1))) \
                if x.ndim >= 1 else P()
            return jax.device_put(x, NamedSharding(self._mesh, spec))

        return jax.tree_util.tree_map(put, tree)

    def _init_states(self) -> None:
        """(Re)build the stacked device state for fresh lanes."""
        fresh = self._states is None
        with self._lock:
            resets, self._pending_reset = self._pending_reset, []
        try:
            if fresh:
                per_lane = []
                for s in self.lanes:
                    s._ensure_states()
                    per_lane.append(([p.dev_state for p in s.parts],
                                     s.post_state))
                states, posts = zip(*per_lane)
                self._states = self._lane_shard(jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *states))
                self._post_state = self._lane_shard(jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *posts))
                return
            for i, lane in enumerate(resets):
                s = self.lanes[lane]
                s._ensure_states()
                lane_state = [p.dev_state for p in s.parts]
                self._states = jax.tree_util.tree_map(
                    lambda acc, x: acc.at[lane].set(x), self._states,
                    lane_state)
                self._post_state = jax.tree_util.tree_map(
                    lambda acc, x: acc.at[lane].set(x),
                    self._post_state, s.post_state)
                resets[i] = None  # applied
        except BaseException:
            # a transient device error mid-build (callers may retry the
            # block) must not silently drop pending resets/restores — the
            # lane would keep its previous user's device state
            with self._lock:
                if fresh:
                    # partial fresh build: rebuild wholesale on retry (the
                    # sessions still hold the truth)
                    self._states = None
                    self._post_state = None
                    self._pending_reset = resets + self._pending_reset
                else:
                    self._pending_reset = (
                        [l for l in resets if l is not None]
                        + self._pending_reset)
            raise

    def _build_step(self, progs_np) -> None:
        """Jit the vmapped per-lane step, specialized to the current prog
        window shapes. The per-block upload is latency-bound through the
        remote tunnel (one RPC per array), so ALL per-block inputs — every
        program-window leaf plus the lane's start frame — are packed into a
        single [L, words] uint32 array on the host and unpacked with free
        bitcasts inside the jitted step: one transfer per block."""
        body = self.lanes[0]._step_body()
        block = self.lanes[0].block_size
        leaves, treedef = jax.tree_util.tree_flatten(progs_np)
        # every program leaf the planners emit is a 4-byte scalar type
        # (f32/i32/u32); widen here if that ever changes
        assert all(l.dtype.itemsize == 4 for l in leaves), \
            [l.dtype for l in leaves]
        shapes = [l.shape[1:] for l in leaves]
        dtypes = [l.dtype for l in leaves]
        sizes = [int(np.prod(s, dtype=np.int64)) for s in shapes]
        offs = np.concatenate([[0], np.cumsum(sizes)]).astype(int)

        def pack(spans, windows):
            progs = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *windows)
            L = len(windows)
            flat = [
                np.ascontiguousarray(l).view(np.uint32).reshape(L, -1)
                for l in jax.tree_util.tree_leaves(progs)
            ]
            f0s = np.asarray([[f0] for (f0, _f1) in spans], dtype=np.int32)
            return np.concatenate([f0s.view(np.uint32)] + flat, axis=1)

        def lane_step(states, post_state, packed):
            f0 = jax.lax.bitcast_convert_type(packed[0], jnp.int32)
            t_idx = f0 + jnp.arange(block, dtype=jnp.int32)
            body_leaves = []
            for i in range(len(sizes)):
                seg = packed[1 + offs[i]:1 + offs[i + 1]]
                seg = jax.lax.bitcast_convert_type(
                    seg, jnp.dtype(dtypes[i]))
                body_leaves.append(seg.reshape(shapes[i]))
            progs = jax.tree_util.tree_unflatten(treedef, body_leaves)
            new_states, new_post, out = body(states, post_state, t_idx, progs)
            if self._pcm16_volume is not None:
                from ..core.mixdown import mixdown_s16

                out = mixdown_s16(out, self._pcm16_volume)
            return new_states, new_post, out

        self._pack = pack
        from ..graph import aotcache

        if aotcache.default_cache_dir():
            # ZANG_AOT_CACHE: fleet (re)starts and growth re-traces load
            # the vmapped step from disk — no compile on the serving path
            # (complements prewarm, which only hides the cost).
            sess = self.lanes[0]
            try:
                tag = "fleet:" + aotcache.stable_tag(
                    ([(p.instrument, p.polyphony) for p in sess.parts],
                     sess.post_fn, sess.num_channels, sess.block_size,
                     self._pcm16_volume))
            except aotcache.Uncacheable:
                self._step = jax.jit(jax.vmap(lane_step))
            else:
                self._step = aotcache.AotDispatch(jax.vmap(lane_step), tag)
        else:
            self._step = jax.jit(jax.vmap(lane_step))
        self._step_capacity = self.lanes[0].slot_capacity

    def render_block_async(self) -> jax.Array:
        """Dispatch every lane's next block in ONE device call and return
        the audio as a device array WITHOUT fetching it.

        The next block's only device-side dependency is the carried state,
        which stays on device — so a server can dispatch block N+1 before
        downloading block N's audio and hide the tunnel round-trip behind
        compute (double-buffering: one extra block of output latency, which
        is the standard audio-callback tradeoff). Convert with np.asarray
        when the audio is needed; render_block() does exactly that."""
        spans, windows = self._collect_windows()
        self._init_states()
        cap = self.lanes[0].slot_capacity
        if self._step is None or self._step_capacity != cap:
            self._build_step(jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *windows))
            if self._prewarm:
                self._prewarm_async(2 * self.num_lanes)
        packed = self._lane_shard(jnp.asarray(self._pack(spans, windows)))
        self._states, self._post_state, out = self._step(
            self._states, self._post_state, packed)
        for s, (_f0, f1) in zip(self.lanes, spans):
            s.frame = f1
        return out

    def render_block(self) -> np.ndarray:
        """Render every lane's next block in ONE device call.

        Returns [num_lanes, num_channels, block_size] — f32 mix, or i16
        PCM when pcm16_volume is set."""
        return np.asarray(self.render_block_async())

    def render_blocks(self, count: int) -> np.ndarray:
        """[num_lanes, num_channels, count*block_size]."""
        return np.concatenate([self.render_block() for _ in range(count)],
                              axis=2)
