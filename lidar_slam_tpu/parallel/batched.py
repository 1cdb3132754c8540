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


def make_gated_optimize(config: SlamConfig):
    """One lax.cond OUTSIDE the vmap gating a batched masked LM chunk on
    "any sequence has a pending optimization" — under vmap an in-graph cond
    lowers to a select that would run the optimizer on every lane every
    detection pass. Shared by the streaming loop wrapper and the multi-tick
    resident path. Returns ``gated(poses, pgs, n_poses, pending) ->
    (poses, pending)``."""

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
        new_poses = jnp.where(pending[:, None, None, None], new_poses, poses)
        # unconverged bounded chunks stay pending; the next detection
        # pass (or finalize) continues from the updated poses
        return new_poses, pending & ~conv

    def gated(poses, pgs, n_poses, pending):
        return jax.lax.cond(
            jnp.any(pending), do_opt, lambda a: (a[0], a[3]),
            (poses, pgs, n_poses, pending),
        )

    return jax.jit(gated)


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
    gated_opt = make_gated_optimize(config) if optimize_midrun else None

    def loop(state, frames):
        state, det = loop_inner(state, frames)
        if not optimize_midrun:
            return state, det  # pending accumulates for finalize
        poses, pending = gated_opt(
            state.poses, state.pg, state.n_poses, state.pending_optimize
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
        self._optimize_midrun = optimize_midrun
        (self._init, self._step, self._loop, self._optimize, self._finalize) = (
            make_batched_fns(config, mesh, optimize_midrun=optimize_midrun)
        )
        self._block = max(config.dispatch_block, 0)
        self._n_ticks = 1
        self._multi_tick_fn = None
        self._gated_opt = None
        if self._block > 1:
            cad = config.loop_check_every
            if self._block % cad == 0:
                # block SPANS several cadence periods: the covered queries run
                # bunched in one vmapped multi-tick dispatch after each block
                # (detection-exact — pipeline.make_multi_tick_fn; same lift of
                # the block|cadence restriction as the single engine)
                self._n_ticks = self._block // cad
                if self._n_ticks > 1:
                    inner_mt = pipe.make_multi_tick_fn(
                        config, in_graph_optimize=False
                    )
                    self._multi_tick_fn = jax.jit(
                        jax.vmap(inner_mt, in_axes=(0, None))
                    )
                    if optimize_midrun:
                        self._gated_opt = make_gated_optimize(config)
            elif cad % self._block != 0:
                raise ValueError(
                    f"dispatch_block={self._block} must divide or be a "
                    f"multiple of loop_check_every={cad} so loop detection "
                    "stays on the reference cadence"
                )
            inner = pipe.make_block_step_fn(config, self._block)
            self._block_fn = jax.jit(
                jax.vmap(inner, in_axes=(0, 0, 0, None)), donate_argnums=0
            )
        self._pending: list = []  # buffered (B, N, 3) numpy frames
        self._resident = None     # ((B, T, N, 3) store, (B, T) counts)
        self._resident_frame0 = 0
        self._resident_block_fn = None
        self.state = stack_states([pipe.init_state(config) for _ in range(batch)])
        self._frame = 0

    def reset(self) -> None:
        """Blank the SLAM state without rebuilding the jitted programs
        (bench warmup-run methodology — compile is paid once per process)."""
        self._pending.clear()
        self.state = stack_states(
            [pipe.init_state(self.config) for _ in range(self.batch)]
        )
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

    def _run_ticks(self, lo: int, hi: int) -> None:
        """Run every loop-cadence tick whose frame falls in [lo, hi] — one
        vmapped multi-tick dispatch when the block spans several cadence
        periods, else one batched loop dispatch per cadence frame."""
        cfg = self.config
        cad = cfg.loop_check_every
        lo = max(lo, cfg.loop_start_frame + 1)
        start = -(-lo // cad) * cad  # first cadence frame >= lo
        frames = list(range(start, hi + 1, cad))
        if not frames:
            return
        if self._multi_tick_fn is not None:
            padded = frames + [-1] * (self._n_ticks - len(frames))
            out = self._multi_tick_fn(
                self.state, jnp.asarray(padded[: self._n_ticks], jnp.int32)
            )
            pg_s, poses, lc_n, vf_n, vff_n, vbh_n, pend = out
            self.state = self.state._replace(
                pg=pg_s, poses=poses, loop_count=lc_n,
                verify_fired=vf_n, verify_fine_fired=vff_n,
                verify_bound_hit=vbh_n, pending_optimize=pend,
            )
            if self._gated_opt is not None:
                poses, pend = self._gated_opt(
                    self.state.poses, self.state.pg, self.state.n_poses,
                    self.state.pending_optimize,
                )
                self.state = self.state._replace(
                    poses=poses, pending_optimize=pend
                )
        else:
            for fr in frames:
                fv = jnp.full((self.batch,), fr, jnp.int32)
                self.state, _ = self._loop(self.state, fv)

    def _dispatch_pending(self) -> None:
        if not self._pending:
            return
        n = len(self._pending)
        frame0 = self._pending_frame0
        if n == self._block:
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
        if self._n_ticks > 1:
            self._run_ticks(frame0, frame0 + n - 1)

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
            # (multi-tick engines run their bunched ticks inside
            # _dispatch_pending; sync_info detection dicts are only
            # available at block <= cadence)
            if (
                self._n_ticks == 1
                and not self._pending
                and self._frame % cfg.loop_check_every == 0
                and self._frame > cfg.loop_start_frame
            ):
                frames = jnp.full((self.batch,), self._frame, jnp.int32)
                self.state, det = self._loop(self.state, frames)
                if sync_info:
                    found = int(jnp.sum(det.accepted.astype(jnp.int32)))
        self._frame += 1
        return found

    # -- resident-scan execution (transfer-free steady state) ---------------

    def preload(self, seqs: list, frame0: int = 0) -> None:
        """Upload all prepared scans for every lane ONCE as a (B, T, N, 3)
        device store (the single engine's transfer-free steady state,
        pipeline.SlamEngine.preload, lifted over the batch axis).

        ``seqs``: B equal-length lists of prepared (n_i, 3) scans. Call
        BEFORE any result fetch (the tunneled-runtime bandwidth cliff —
        see pipeline.make_resident_block_fn)."""
        import functools

        assert len(seqs) == self.batch, (len(seqs), self.batch)
        T = len(seqs[0])
        assert all(len(s) == T for s in seqs), "lanes must be equal length"
        cfg = self.config
        cap = cfg.max_points if cfg.host_voxelize else cfg.max_raw_points
        B = self.batch
        cnt = np.zeros((B, T), np.int32)
        # chunked upload over the frame axis (same ~128 MiB fast-path chunks
        # as the single engine)
        rows = max(1, (128 * 2**20) // (cap * 12 * B))
        write = functools.partial(jax.jit, donate_argnums=0)(
            lambda buf, c, i: jax.lax.dynamic_update_slice_in_dim(buf, c, i, 1)
        )
        store = jnp.zeros((B, T, cap, 3), jnp.float32)
        for s0 in range(0, T, rows):
            hi = min(s0 + rows, T)
            chunk = np.zeros((B, hi - s0, cap, 3), np.float32)
            for b in range(B):
                for i in range(s0, hi):
                    m = min(len(seqs[b][i]), cap)
                    chunk[b, i - s0, :m] = seqs[b][i][:m]
                    cnt[b, i] = m
            store = write(store, jnp.asarray(chunk), jnp.int32(s0))
        self._resident = (store, jnp.asarray(cnt))
        if self._resident_frame0 != frame0:
            self._resident_block_fn = None  # offset is baked into the jit
        self._resident_frame0 = frame0
        if self._block > 1 and self._resident_block_fn is None:
            inner = pipe.make_resident_block_fn(
                cfg, self._block, frame_offset=frame0
            )
            self._resident_block_fn = jax.jit(
                jax.vmap(inner, in_axes=(0, 0, 0, None)), donate_argnums=0
            )

    def run_preloaded(self) -> None:
        """Process every preloaded scan on every lane (same math and loop
        cadence as ``push_scans`` streaming, zero steady-state host->device
        data transfers)."""
        if self._resident is None:
            raise ValueError("call preload(seqs) first")
        scans, counts = self._resident
        row0 = self._resident_frame0
        T = int(scans.shape[1])
        if self._frame < row0:
            raise ValueError(
                f"preload(frame0={row0}) starts past engine frame "
                f"{self._frame} — preload the missing frames too"
            )
        if self._frame == 0 and T > 0:
            self.state = self._init(self.state, scans[:, 0], counts[:, 0])
            self._frame = 1
        blk = self._block if self._block > 1 else 1
        f = self._frame
        while f < row0 + T:
            lo = f
            r = f - row0
            if blk > 1 and r + blk <= T:
                self.state = self._resident_block_fn(
                    self.state, scans, counts, jnp.int32(r)
                )
                f += blk
            else:
                fv = jnp.full((self.batch,), f, jnp.int32)
                self.state = self._step(
                    self.state, scans[:, r], counts[:, r], fv
                )
                f += 1
            self._run_ticks(lo, f - 1)
        self._frame = row0 + T

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
