"""Batched multi-sequence SLAM (config ladder #4: K sequences on one program).

The whole pipeline is pure over a SlamState pytree, so running K KITTI
sequences concurrently is a ``vmap`` of the per-scan step over a leading
batch axis — the reference, being a single ROS node, has no analog. With a
mesh, the batch axis is sharded over 'seq' (data parallelism) via
NamedSharding so XLA places each sequence's state on its own chips.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SlamConfig
from ..models import pipeline as pipe


def _rescue_lane(st_b, pg_cfg) -> np.ndarray:
    """Precision escalation for ONE stalled lane's pose graph: the
    on-device emulated-f64 LM first (pose_graph.optimize_dd), NumPy-f64
    host LM as the last resort — the same ladder as
    pose_graph.optimize_chunked. Returns the optimized (F, 4, 4) poses."""
    from ..models import pose_graph as pg

    res = None
    if pg.dd_backend_healthy():  # selftest + known-answer gate (see pose_graph)
        res = pg.optimize_dd(st_b, pg_cfg)
    if res is None or not bool(res.converged):
        st = st_b if res is None else st_b._replace(poses=res.poses)
        res = pg.optimize_host(st, pg_cfg)
    return np.asarray(res.poses)


def stack_states(states):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def make_batched_fns(config: SlamConfig, mesh: Optional[Mesh] = None,
                     seq_axis: str = "seq", optimize_midrun: bool = True):
    """vmapped (init, step, loop, optimize, finalize) over a leading batch axis.

    With ``mesh``, inputs/outputs are constrained to batch-axis sharding over
    ``seq_axis``. ``optimize_midrun=False`` drops the in-graph optimize from
    the detection tick entirely: under vmap ALL lanes pay for the LM chunk
    whenever ANY lane found a loop, and mid-run optimization only shapes
    intermediate poses — detection is pose-independent and finalize
    optimizes to convergence anyway, so the aggregate-throughput win is free
    of final-accuracy cost.
    """
    init = jax.vmap(pipe.make_init_fn(config))
    step = jax.vmap(pipe.make_step_fn(config))
    # Under vmap an in-graph lax.cond lowers to a select that would run the
    # optimizer on every detection pass, so the per-sequence loop_fn skips
    # optimization; instead ONE cond OUTSIDE the vmap gates a batched masked
    # optimize on "any sequence accepted a loop" — fully on device, no host
    # sync (~50 ms each over a TPU tunnel), and the optimizer only executes
    # on passes where some sequence actually found a loop.
    loop_inner = jax.vmap(pipe.make_loop_fn(config, in_graph_optimize=False))

    def loop(state, frames):
        state, det = loop_inner(state, frames)

        def do_opt(args):
            poses, pgs, n_poses, pending = args

            def opt_one(poses_b, pg_b, n_b):
                from ..models import pose_graph as pg

                res = pg.optimize(
                    pg_b._replace(poses=poses_b), config.pg,
                    max_iterations=config.pg.inline_max_iterations,
                )
                idx = jnp.arange(poses_b.shape[0])
                return (
                    jnp.where((idx < n_b)[:, None, None], res.poses, poses_b),
                    res.converged,
                )

            new_poses, conv = jax.vmap(opt_one)(poses, pgs, n_poses)
            # sequences with nothing pending keep their poses untouched
            new_poses = jnp.where(
                pending[:, None, None, None], new_poses, poses
            )
            # unconverged bounded chunks stay pending; the next detection
            # pass (or finalize) continues from the updated poses
            return new_poses, pending & ~conv

        if not optimize_midrun:
            return state, det  # pending accumulates for finalize

        poses, pending = jax.lax.cond(
            jnp.any(state.pending_optimize),
            do_opt,
            lambda args: (args[0], args[3]),
            (state.poses, state.pg, state.n_poses, state.pending_optimize),
        )
        state = state._replace(poses=poses, pending_optimize=pending)
        return state, det

    loop = jax.jit(loop, donate_argnums=0)
    optimize = jax.vmap(pipe.make_optimize_fn(config))
    finalize = jax.vmap(pipe.make_finalize_fn(config))

    if mesh is not None:
        sharding = NamedSharding(mesh, P(seq_axis))

        def shard(f):
            def wrapped(*args):
                args = jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(x, sharding), args
                )
                return f(*args)

            return jax.jit(wrapped)

        init, step, loop, optimize, finalize = map(
            shard, (init, step, loop, optimize, finalize)
        )
    return init, step, loop, optimize, finalize


class BatchedSlamEngine:
    """Run K sequences in lockstep as one batched XLA program."""

    def __init__(self, config: SlamConfig, batch: int, mesh: Optional[Mesh] = None,
                 optimize_midrun: bool = True):
        self.config = config
        self.batch = batch
        self.mesh = mesh
        (self._init, self._step, self._loop, self._optimize, self._finalize) = (
            make_batched_fns(config, mesh, optimize_midrun=optimize_midrun)
        )
        self._block = max(config.dispatch_block, 0)
        if self._block > 1:
            if config.loop_check_every % self._block != 0:
                raise ValueError(
                    f"dispatch_block={self._block} must divide "
                    f"loop_check_every={config.loop_check_every}"
                )
            inner = pipe.make_block_step_fn(config, self._block)
            self._block_fn = jax.jit(
                jax.vmap(inner, in_axes=(0, 0, 0, None)), donate_argnums=0
            )
        self._pending: list = []  # buffered (B, N, 3) numpy frames
        self.state = stack_states([pipe.init_state(config) for _ in range(batch)])
        self._frame = 0

    def pad_scans_np(self, scans):
        cap = self.config.max_raw_points
        pts = np.zeros((self.batch, cap, 3), np.float32)
        counts = np.zeros((self.batch,), np.int32)
        for b, s in enumerate(scans):
            n = min(len(s), cap)
            pts[b, :n] = s[:n]
            counts[b] = n
        return pts, counts

    def pad_scans(self, scans):
        pts, counts = self.pad_scans_np(scans)
        return jnp.asarray(pts), jnp.asarray(counts)

    def _dispatch_pending(self) -> None:
        if not self._pending:
            return
        frame0 = self._pending_frame0
        if len(self._pending) == self._block:
            # (Nb, B, N, 3) -> (B, Nb, N, 3); ONE host->device put per block
            raws = jnp.asarray(
                np.stack([p[0] for p in self._pending], axis=1)
            )
            counts = jnp.asarray(
                np.stack([p[1] for p in self._pending], axis=1)
            )
            self.state = self._block_fn(
                self.state, raws, counts, jnp.int32(frame0)
            )
        else:
            for k, (pts, counts) in enumerate(self._pending):
                frames = jnp.full((self.batch,), frame0 + k, jnp.int32)
                self.state = self._step(
                    self.state, jnp.asarray(pts), jnp.asarray(counts), frames
                )
        self._pending.clear()

    def flush(self) -> None:
        if self._pending:
            self._dispatch_pending()

    def push_scans(self, scans, sync_info: bool = False) -> Optional[int]:
        """One scan per sequence. Detection + gated optimization run fully on
        device (no host syncs). With ``sync_info=True`` the total number of
        loops accepted by this pass is fetched and returned (costly sync —
        for tests/debugging only). ``dispatch_block > 1`` buffers frames and
        runs one vmapped block dispatch (same RPC amortization as the single
        engine)."""
        found = None
        if self._frame == 0:
            raw, counts = self.pad_scans(scans)
            self.state = self._init(self.state, raw, counts)
        else:
            if self._block > 1:
                if not self._pending:
                    self._pending_frame0 = self._frame
                self._pending.append(self.pad_scans_np(scans))
                if self._frame % self._block == 0:
                    self._dispatch_pending()
            else:
                raw, counts = self.pad_scans(scans)
                frames = jnp.full((self.batch,), self._frame, jnp.int32)
                self.state = self._step(self.state, raw, counts, frames)
            cfg = self.config
            if (
                not self._pending
                and self._frame % cfg.loop_check_every == 0
                and self._frame > cfg.loop_start_frame
            ):
                frames = jnp.full((self.batch,), self._frame, jnp.int32)
                self.state, det = self._loop(self.state, frames)
                if sync_info:
                    found = int(jnp.sum(det.accepted.astype(jnp.int32)))
        self._frame += 1
        return found

    def finalize(self):
        """Final batched optimize to convergence (host-chunked: at most
        ``inline_max_iterations`` LM iterations per dispatch, one (B,)-flag
        sync per chunk) + the vmapped occupancy rebuild."""
        self.flush()
        cfg = self.config.pg
        chunks = max(cfg.max_iterations // max(cfg.inline_max_iterations, 1), 1)
        res = None
        prev_err = None
        for _ in range(chunks):
            self.state, res = self._optimize(self.state)
            pending = np.asarray(self.state.pending_optimize)
            if not pending.any():
                break
            # f32 cost-stall early exit (mirrors pose_graph.optimize_chunked):
            # when no still-pending lane improved its cost by >=1% over a
            # whole chunk, f32 has hit its dynamic-range wall — stop burning
            # device chunks and go straight to the f64 host rescue.
            errs = np.asarray(res.final_error)
            if prev_err is not None and np.all(
                errs[pending] > prev_err[pending] * 0.99
            ):
                break
            prev_err = errs
        pending = np.asarray(self.state.pending_optimize)
        if pending.any():
            # f32 device LM stalled for some sequences; per-lane precision
            # escalation (same ladder as pose_graph.optimize_chunked)
            poses = np.array(self.state.poses)  # mutable copy
            for b in np.where(pending)[0]:
                st_b = jax.tree.map(lambda x: x[b], self.state.pg)
                st_b = st_b._replace(poses=self.state.poses[b])
                lane_poses = _rescue_lane(st_b, cfg)
                nb = int(self.state.n_poses[b])
                poses[b, :nb] = lane_poses[:nb]
            self.state = self.state._replace(
                poses=jnp.asarray(poses),
                pending_optimize=jnp.zeros_like(self.state.pending_optimize),
            )
        self.state = self._finalize(self.state)
        return res

    def trajectories(self) -> np.ndarray:
        self.flush()
        n = int(jnp.max(self.state.n_poses))
        return np.asarray(self.state.poses[:, :n])
