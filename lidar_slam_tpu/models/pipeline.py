"""The end-to-end SLAM pipeline: per-scan step, loop detection, optimization.

Replaces the reference SlamNode orchestrator (slam_node.cpp:11-229). The
reference is a ROS2 timer loop mutating heap state; here the entire SLAM
state is one pytree of fixed-shape device arrays and each stage is a
jit-compiled, donated-buffer function:

- :func:`make_step_fn`        — process_frame (slam_node.cpp:118-175)
- :func:`make_loop_fn`        — loop detection + factor insertion (:159-167)
- :func:`make_optimize_fn`    — run_pose_graph_optimization (:177-185)
- :func:`make_finalize_fn`    — final optimize + occupancy rebuild (:103-108,
                                196-229)

The host driver (:class:`SlamEngine`) only does file I/O, scheduling (the
every-10-frames loop cadence, slam_node.cpp:160) and artifact export — every
FLOP is on device.

Behavioral parity notes (SURVEY.md quirk list):
- Frame-skip under ``min_points``: pose copied, no odometry factor, no DB
  entry, no occupancy update (slam_node.cpp:125-130). Unlike the reference —
  which would crash in GTSAM on the next frame because the skipped index has
  no initial estimate — the pose chain stays consistent here.
- ICP divergence (not converged or error > 1.0) falls back to an identity
  delta but still records the factor with the real fitness
  (slam_node.cpp:139-145).
- Mid-run optimization does NOT rebuild the occupancy grid (quirk #7,
  matching slam_node.cpp:177-185); only finalize does (:207).
- The pose graph is re-optimized from the raw odometry-chained estimates
  (GTSAM initial_estimates_ semantics, pose_graph.cpp:159).
- Consciously fixed: one NN pass per ICP iteration (quirk #1) and per-scan
  normal caching — the previous frame's normals are reused as the ICP target
  normals instead of being recomputed inside every ICP call (icp.hpp:166-171).
"""

from __future__ import annotations

import functools
import time
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..ops import se3
from ..ops.icp import icp_point_to_plane
from ..ops.normals import estimate_normals, estimate_normals_radius
from ..ops.occupancy import empty_grid, update_occupancy
from ..ops.voxel import voxel_downsample
from ..types import PointCloud, strided_prefix_idx
from . import loop_closure as lc
from . import pose_graph as pg


class SlamState(NamedTuple):
    """Entire SLAM state as one pytree (replaces SlamNode members,
    slam_node.hpp:141-170)."""

    pg: pg.PoseGraphState         # factors + raw-chained initial estimates
    poses: jnp.ndarray            # (F, 4, 4) current estimates (poses_)
    n_poses: jnp.ndarray          # () int32
    prev: PointCloud              # prev downsampled cloud (prev_points_)
    prev_normals: jnp.ndarray     # (N, 3) cached normals of prev
    prev_delta: jnp.ndarray       # (4, 4) last accepted odometry delta
    #   (constant-velocity ICP seed when config.icp.warm_start)
    db: lc.KeyframeDB             # loop-closure DB + per-frame cloud storage
    grid: jnp.ndarray             # (D, D) uint8 occupancy
    occ_dropped: jnp.ndarray      # () int32 — in-range points outside the grid
    loop_count: jnp.ndarray       # () int32
    verify_fired: jnp.ndarray     # () int32 — ticks whose SC gate passed
    #   candidates into ICP verification (cost attribution: firing ticks are
    #   ~15x a non-firing tick's cost at bench shapes, tools/profile_detect)
    verify_fine_fired: jnp.ndarray  # () int32 — firing ticks where at least
    #   one candidate survived the coarse early-reject gate into the fine
    #   verify loop (== verify_fired when lc.verify_coarse_reject == 0)
    verify_bound_hit: jnp.ndarray   # () int32 — firing ticks where the
    #   bounded tranche walk stopped short of the reference's unbounded
    #   verify-until-accepted walk (more SC-gate candidates existed than the
    #   M = max_candidates * (1 + verify_extra_tranches) bound AND fewer
    #   than max_candidates were accepted — the reference would have kept
    #   verifying, loop_closure.hpp:96-123)
    pending_optimize: jnp.ndarray # () bool — loop accepted since last optimize
    # per-frame metrics (the reference logs these, slam_node.cpp:169-174)
    icp_error: jnp.ndarray        # (F,)
    icp_iters: jnp.ndarray        # (F,) int32
    icp_converged: jnp.ndarray    # (F,) bool
    frame_npts: jnp.ndarray       # (F,) int32


def _normals_fn(config: SlamConfig) -> Callable:
    """Per-scan normal estimator (cached and reused as the next frame's ICP
    target normals).

    'adaptive' (default) and 'radius' are the TPU-native formulations:
    metric-ball moment accumulation as masked matmul chains that XLA fuses
    end-to-end; 'adaptive' picks per-point radii targeting k neighbors so
    ring-pattern anisotropy can't degenerate the neighborhood (see
    ops/normals.estimate_normals_adaptive — same cost, required for
    realistic LiDAR). A hand-written Pallas moment kernel was tried and
    REMOVED in round 2: its K=8 / N=16 matmuls starve the MXU (measured
    167 ms vs 6.5 ms for the XLA path at 16k points on v5e)."""
    if config.normal_method == "adaptive":
        from ..ops.normals import estimate_normals_adaptive

        r = config.effective_normal_radius
        w = config.normal_window
        return lambda pts, mask: estimate_normals_adaptive(
            pts, mask,
            k=config.normal_k_target,
            r_probe=(config.normal_probe_lo, config.normal_probe_hi),
            r_min=r, r_max=config.normal_r_max, window=w,
            stride=config.normal_stride,
            probe_stride=config.normal_probe_stride,
        )
    if config.normal_method == "radius":
        r = config.effective_normal_radius
        st = config.normal_stride
        w = config.normal_window
        return lambda pts, mask: estimate_normals_radius(
            pts, mask, radius=r, stride=st, window=w
        )
    k = config.icp.normal_k
    return lambda pts, mask: estimate_normals(pts, mask, k=k)


def _downsample_fn(config: SlamConfig) -> Callable:
    """Per-scan cloud preparation from (padded raw points, count).

    ``host_voxelize``: the loader already voxelized on the host (overlapped
    with device compute); just truncate/mask. Otherwise run the device
    sort-based voxel kernel (ops/voxel.py)."""
    if config.host_voxelize:

        def prep(raw_pts, raw_count):
            pts = raw_pts[: config.max_points]
            mask = jnp.arange(config.max_points) < raw_count
            return PointCloud(jnp.where(mask[:, None], pts, 0.0), mask)

        return prep

    def prep(raw_pts, raw_count):
        raw_mask = jnp.arange(raw_pts.shape[0]) < raw_count
        return voxel_downsample(
            raw_pts, raw_mask, config.voxel_size, config.max_points
        )

    return prep


def _resolve_nn1(config: SlamConfig) -> Optional[Callable]:
    """Pick the odometry 1-NN backend.

    'auto' resolves to 'pallas' on TPU and 'xla' elsewhere — both are EXACT
    brute-force searches. The pruned backends are opt-in because their
    windows can miss the true neighbor on adversarial geometry:

    - 'slab': x-slab contiguous-window search over the x-major-sorted cloud
      (~2.5x faster standalone than brute force; exact for small inter-frame
      motion, but window misses under per-frame rotation cost ATE at bench
      shapes).
    - 'grid': sorted-cell-key 3x3-probe search (the TPU analog of the
      reference KD-tree's spatial pruning, kdtree.hpp:112-142; exact whenever
      the true NN is within one cell, here 2 * voxel_size).
    - 'xla': streamed brute force (CPU-friendly).
    """
    backend = config.knn_backend
    if backend == "xla":
        return None  # icp default
    if backend == "slab":
        from ..ops.slab_nn import nn1_slab

        return lambda s, t, m: nn1_slab(s, t, m)
    if backend == "slab_pallas":
        from ..ops.knn_pallas import make_slab_pallas_backend, pallas_supported

        return make_slab_pallas_backend(
            window=config.slab_window, interpret=not pallas_supported()
        )
    if backend == "grid":
        from ..ops.grid_nn import make_grid_backend

        return make_grid_backend(cell=2.0 * config.voxel_size)
    try:
        from ..ops.knn_pallas import nn1_pallas, pallas_supported
    except ImportError:
        return None
    if backend == "pallas" or (backend == "auto" and pallas_supported()):
        return lambda s, t, m: nn1_pallas(s, t, m)
    return None


def init_state(config: SlamConfig) -> SlamState:
    """Blank state: pose 0 = identity with a prior factor (slam_node.cpp:64-66)."""
    F = config.max_frames
    return SlamState(
        pg=pg.init_state(F, config.max_loop_factors),
        poses=jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (F, 1, 1)),
        n_poses=jnp.int32(1),
        prev=PointCloud(
            jnp.zeros((config.max_points, 3), jnp.float32),
            jnp.zeros((config.max_points,), bool),
        ),
        prev_normals=jnp.zeros((config.max_points, 3), jnp.float32),
        prev_delta=jnp.eye(4, dtype=jnp.float32),
        db=lc.init_db(F, config.lc_points, config.sc),
        grid=empty_grid(config.grid),
        occ_dropped=jnp.int32(0),
        loop_count=jnp.int32(0),
        verify_fired=jnp.int32(0),
        verify_fine_fired=jnp.int32(0),
        verify_bound_hit=jnp.int32(0),
        pending_optimize=jnp.bool_(False),
        icp_error=jnp.zeros((F,), jnp.float32),
        icp_iters=jnp.zeros((F,), jnp.int32),
        icp_converged=jnp.zeros((F,), bool),
        frame_npts=jnp.zeros((F,), jnp.int32),
    )


def make_init_fn(config: SlamConfig):
    """First-frame initialization (SlamNode ctor, slam_node.cpp:64-81).

    All per-tick functions donate the state pytree: the multi-GB keyframe DB
    buffers must be updated in place, not copied per frame."""

    normals_fn = _normals_fn(config)
    downsample_fn = _downsample_fn(config)

    @functools.partial(jax.jit, donate_argnums=0)
    def init_fn(state: SlamState, raw_pts, raw_count, raw_normals=None) -> SlamState:
        curr = downsample_fn(raw_pts, raw_count)
        if config.host_normals and raw_normals is not None:
            normals = jnp.where(curr.mask[:, None], raw_normals[: config.max_points], 0.0)
        else:
            normals = normals_fn(curr.points, curr.mask)
        # frame 0's cloud is stored for map building but NOT added to the
        # loop DB (addFrame only runs in process_frame, slam_node.cpp:159;
        # the ctor doesn't call it) -> enabled=False keeps in_db[0] False.
        db = lc.add_frame(
            state.db, curr, jnp.int32(0), config.sc, enabled=False,
            normals=normals,
        )
        return state._replace(
            prev=curr,
            prev_normals=normals,
            db=db,
            frame_npts=state.frame_npts.at[0].set(curr.count()),
        )

    return init_fn


def _make_step_body(config: SlamConfig, nn1_fn: Optional[Callable] = None):
    """The un-jitted per-scan step body, shared by :func:`make_step_fn`
    (one dispatch per scan) and :func:`make_block_step_fn` (one dispatch per
    ``block`` scans via ``lax.scan`` — the host→device dispatch itself costs
    ~2.5-6 ms on a tunneled TPU regardless of program size, so at the
    ~5 ms/frame north-star budget per-frame dispatching is the bottleneck)."""
    if nn1_fn is None:
        nn1_fn = _resolve_nn1(config)
    normals_fn = _normals_fn(config)

    downsample_fn = _downsample_fn(config)

    def step_body(state: SlamState, raw_pts, raw_count, frame, raw_normals=None) -> SlamState:
        frame = frame.astype(jnp.int32)
        curr = downsample_fn(raw_pts, raw_count)
        npts = curr.count()
        ok = npts >= config.min_points

        init_T = state.prev_delta if config.icp.warm_start else None
        res = icp_point_to_plane(
            curr, state.prev, state.prev_normals, config.icp, init_T,
            nn1_fn=nn1_fn,
        )
        # f32 divergence can overflow to NaN (the reference's f64 LDLT just
        # yields a huge-but-finite error, slam_node.cpp:139); sanitize so the
        # recorded fitness can't poison the factor weights (1 + 10 * NaN) or
        # the NaN>thresh comparison (False) downstream.
        fitness = jnp.where(
            jnp.isfinite(res.final_error), res.final_error, jnp.float32(1e6)
        )
        diverged = jnp.logical_or(
            jnp.logical_not(res.converged), fitness > config.divergence_error
        )
        delta = jnp.where(
            ok & ~diverged, res.transformation, jnp.eye(4, dtype=jnp.float32)
        )

        prev_pose = state.poses[frame - 1]
        new_pose = se3.orthonormalize(se3.compose(prev_pose, delta))
        poses = state.poses.at[frame].set(new_pose)

        pg_state = pg.add_odometry(
            state.pg, frame, delta, fitness, valid=ok
        )

        world = se3.apply(new_pose, curr.points)
        grid, occ_drop = update_occupancy(
            state.grid, world, curr.mask & ok, se3.trans(new_pose)[:2], config.grid
        )

        if config.host_normals and raw_normals is not None:
            normals = jnp.where(
                curr.mask[:, None], raw_normals[: config.max_points], 0.0
            )
        else:
            normals = normals_fn(curr.points, curr.mask)
        # ONE fused DB update: cloud/mask/normals stored for every frame (the
        # reference push_backs the cloud before the skip guard,
        # slam_node.cpp:123-130), descriptor/in_db gated on ``ok``. Writing
        # any multi-GB DB buffer twice in one program forces a full copy
        # (~11 ms at KITTI scale) — see lc.add_frame.
        db = lc.add_frame(
            state.db, curr, frame, config.sc, enabled=ok, normals=normals
        )

        return state._replace(
            pg=pg_state,
            poses=poses,
            n_poses=jnp.maximum(state.n_poses, frame + 1),
            prev=curr,
            prev_normals=normals,
            prev_delta=delta,
            db=db,
            grid=grid,
            occ_dropped=state.occ_dropped + occ_drop,
            icp_error=state.icp_error.at[frame].set(fitness),
            icp_iters=state.icp_iters.at[frame].set(res.num_iterations),
            icp_converged=state.icp_converged.at[frame].set(res.converged),
            frame_npts=state.frame_npts.at[frame].set(npts),
        )

    return step_body


def make_step_fn(config: SlamConfig, nn1_fn: Optional[Callable] = None):
    """Per-scan odometry step (process_frame, slam_node.cpp:118-175).

    ``nn1_fn`` overrides the correspondence-search backend (e.g. the
    mesh-sharded collective search from parallel/sharded_knn.py)."""
    body = _make_step_body(config, nn1_fn)
    return functools.partial(jax.jit, donate_argnums=0)(body)


def make_block_step_fn(config: SlamConfig, block: int,
                       nn1_fn: Optional[Callable] = None):
    """Process ``block`` consecutive scans in ONE device dispatch.

    ``lax.scan`` over the per-scan step body: identical math and state
    evolution to ``block`` calls of :func:`make_step_fn`, but the fixed
    per-dispatch overhead (a blocking ~9 ms RPC over the TPU tunnel) is paid
    once per block instead of once per frame. The engine sizes blocks to the
    loop cadence (slam_node.cpp:160) so detection still runs exactly at the
    reference's every-10-frames boundary.

    Loop detection is deliberately NOT fused into this program (it runs as
    its own dispatch, :func:`make_loop_fn` / :func:`make_multi_tick_fn`):
    nesting detect's lax.cond-gated verification inside the big block
    program makes the TPU compiler materialize copies of the captured DB
    buffers per dispatch (measured 4x slower at F=308, compile failure at
    F=1508) — the same pathology that forced detect's gathered-slice
    design. The standalone loop dispatch costs one extra ~9 ms RPC per
    cadence period instead.

    Signature: ``block_fn(state, raw_blk (B, N, 3), counts (B,), frame0,
    raw_normals_blk=None) -> state`` where scan k is frame ``frame0 + k``.
    """
    body = _make_step_body(config, nn1_fn)

    @functools.partial(jax.jit, donate_argnums=0)
    def block_fn(state: SlamState, raw_blk, counts, frame0,
                 raw_normals_blk=None) -> SlamState:
        frame0 = frame0.astype(jnp.int32)

        def scan_body(st, inp):
            if raw_normals_blk is None:
                pts, cnt, k = inp
                return body(st, pts, cnt, frame0 + k), ()
            pts, cnt, k, nrm = inp
            return body(st, pts, cnt, frame0 + k, nrm), ()

        ks = jnp.arange(block, dtype=jnp.int32)
        xs = (
            (raw_blk, counts, ks)
            if raw_normals_blk is None
            else (raw_blk, counts, ks, raw_normals_blk)
        )
        state, _ = jax.lax.scan(scan_body, state, xs)
        return state

    return block_fn


def make_resident_block_fn(config: SlamConfig, block: int,
                           nn1_fn: Optional[Callable] = None,
                           frame_offset: int = 0):
    """Process ``block`` consecutive scans sliced from a DEVICE-RESIDENT scan
    store in one dispatch — the only per-dispatch operands are scalars.

    Why this exists: on tunneled TPU runtimes any device->host fetch drops
    the host->device transfer path from ~1.2 GB/s to ~40 MB/s for the rest
    of the process (measured on v5e/axon; the degradation is sticky and
    size-independent). A bench/eval process fetches results between runs, so
    per-block scan uploads (~4 MB) would cost 100+ ms each afterwards —
    25x the block's compute. Uploading the prepared dataset ONCE (before any
    fetch, at healthy bandwidth) and slicing it on device makes the
    steady-state loop transfer-free.

    Signature: ``fn(state, scans (T, N, 3), counts (T,), row0[, normals])
    -> state`` processing rows ``row0 .. row0+block-1`` of ``scans`` as
    frames ``row0+frame_offset ..`` (``frame_offset`` is the dataset frame
    index of row 0 — nonzero only when a resumed run preloads the remaining
    tail of the dataset). ``scans``/``counts`` (and the optional resident
    ``normals`` store, config.host_normals) are NOT donated — pass the same
    device arrays every call.
    """
    body = _make_step_body(config, nn1_fn)

    @functools.partial(jax.jit, donate_argnums=0)
    def resident_block_fn(state: SlamState, scans, counts, row0,
                          normals=None) -> SlamState:
        row0 = row0.astype(jnp.int32)
        # guard keeps the frame_offset=0 HLO identical to the historical
        # signature (the persistent-cache entries stay valid)
        frame0 = row0 + frame_offset if frame_offset else row0
        raw_blk = jax.lax.dynamic_slice_in_dim(scans, row0, block)
        cnt_blk = jax.lax.dynamic_slice_in_dim(counts, row0, block)
        xs = (raw_blk, cnt_blk, jnp.arange(block, dtype=jnp.int32))
        if normals is not None:
            xs = xs + (jax.lax.dynamic_slice_in_dim(normals, row0, block),)

        def scan_body(st, inp):
            pts, cnt, k = inp[:3]
            nrm = inp[3] if len(inp) > 3 else None
            return body(st, pts, cnt, frame0 + k, raw_normals=nrm), ()

        state, _ = jax.lax.scan(scan_body, state, xs)
        return state

    return resident_block_fn


def _make_loop_body(config: SlamConfig, in_graph_optimize: bool = True):
    """Un-jitted loop-tick body shared by :func:`make_loop_fn` (standalone
    dispatch) and :func:`make_block_step_fn` (fused into the block program —
    each dispatch is a blocking ~9 ms RPC on the tunneled runtime, so fusing
    the cadence tick into the block halves the RPCs per 10 frames)."""

    def optimize_small(args):
        # Warm start from the engine's current estimates (which include any
        # previous optimization) instead of the raw odometry chain the
        # reference re-optimizes from (pose_graph.cpp:159) — the optimum is
        # identical, LM just gets there in a fraction of the iterations.
        # LM is bounded per dispatch (inline_max_iterations): an unconverged
        # chunk reports converged=False and the caller keeps pending_optimize
        # set so the next cadence tick continues from the updated poses.
        poses, pg_state, n_poses = args
        # Newest-W loop window: the inline chunk's Woodbury Cholesky runs at
        # (6W)^2 instead of (6*capacity)^2 — see pg.window_loops.
        res = pg.optimize(
            pg.window_loops(
                pg_state._replace(poses=poses),
                config.pg.inline_loop_window,
            ),
            config.pg,
            max_iterations=config.pg.inline_max_iterations,
        )
        idx = jnp.arange(poses.shape[0])
        new_poses = jnp.where((idx < n_poses)[:, None, None], res.poses, poses)
        return new_poses, pg_state, n_poses, res.converged

    # Verification ICP gets the EXACT auto backend (Pallas brute force on
    # TPU, streamed XLA elsewhere) — never the engine's windowed/pruned
    # odometry backend: loop candidates sit at arbitrary offsets, where a
    # slab/grid window can miss the true neighbor. Without this the verify
    # path silently fell back to the streamed default: 304 vs 64 ms per
    # firing pass at bench shapes, identical lane results
    # (tools/profile_firing.py).
    verify_nn1 = _resolve_nn1(config.replace(knn_backend="auto"))

    def loop_body(state: SlamState, frame):
        # Explicit-query form: queries ``frame`` even when the DB head has
        # advanced past it (multi-tick bunching) and rejects everything when
        # ``frame`` was skipped for low point count (see lc.detect).
        det = lc.detect(
            state.db, config.lc, config.sc,
            nn1_fn=verify_nn1,
            query=jnp.asarray(frame, jnp.int32),
        )

        def add_one(k, pg_state):
            return pg.add_loop(
                pg_state,
                det.match_frame[k],
                det.query_frame,
                det.transform[k],
                valid=det.accepted[k],
            )

        pg_state = jax.lax.fori_loop(
            0, det.accepted.shape[0], add_one, state.pg
        )
        n_found = jnp.sum(det.accepted.astype(jnp.int32))
        # A finite sc_distance survives the candidate mask -> this tick ran
        # ICP verification (firing ticks are the loop-machinery cost driver).
        fired = jnp.any(jnp.isfinite(det.sc_distance)).astype(jnp.int32)
        # Bound-binding instrumentation (VERDICT r4 item 3): the reference's
        # verify-until-accepted walk is unbounded (loop_closure.hpp:96-123);
        # this tick had more SC-gate candidates than the tranche bound M and
        # still accepted fewer than max_candidates — the reference would
        # have kept walking.
        M = det.accepted.shape[0]
        bound_hit = (
            (det.n_valid > M) & (n_found < config.lc.max_candidates)
        ).astype(jnp.int32)
        state = state._replace(
            pg=pg_state,
            loop_count=state.loop_count + n_found,
            verify_fired=state.verify_fired + fired,
            verify_fine_fired=(
                state.verify_fine_fired + det.fine_fired.astype(jnp.int32)
            ),
            verify_bound_hit=state.verify_bound_hit + bound_hit,
            pending_optimize=jnp.logical_or(state.pending_optimize, n_found > 0),
        )
        # Optimize in-graph when a loop was found (slam_node.cpp:112-115).
        # lax.cond executes only the taken branch at runtime, and keeping the
        # trigger on device avoids a host sync (~50 ms over a TPU tunnel)
        # per detection pass. The cond carries ONLY the small pose/factor
        # arrays — branches capturing the multi-GB cloud DB crash the TPU
        # compiler at KITTI-scale shapes.
        if in_graph_optimize:
            # Gate on FRESH finds only (the reference optimizes when a loop
            # was found this tick, slam_node.cpp:112-115) — NOT on a
            # persisting pending flag: at full KITTI extents the f32 device
            # LM cannot reach its convergence tolerance (see
            # pose_graph.optimize_host), so pending would stay set and every
            # cadence tick would burn a futile ~107 ms LM chunk (measured:
            # ~11 ms/frame amortized, dwarfing the detect pass itself).
            # Unconverged chunks keep pending_optimize set for finalize's
            # f64 host rescue.
            poses, _, _, converged = jax.lax.cond(
                n_found > 0,
                optimize_small,
                lambda args: (*args, jnp.bool_(True)),
                (state.poses, state.pg, state.n_poses),
            )
            state = state._replace(
                poses=poses,
                pending_optimize=jnp.where(
                    n_found > 0, ~converged, state.pending_optimize
                ),
            )
        return state, det

    return loop_body


def make_loop_fn(config: SlamConfig, in_graph_optimize: bool = True):
    """Loop detection + factor insertion (slam_node.cpp:159-167) as its own
    dispatch.

    ``in_graph_optimize=False`` skips the lax.cond-gated optimization — use
    for vmapped/batched execution, where cond lowers to select and would pay
    for the optimizer on every detection pass; trigger optimization from the
    host instead."""
    body = _make_loop_body(config, in_graph_optimize)
    return functools.partial(jax.jit, donate_argnums=0)(body)


def make_loop_fn_split(config: SlamConfig, in_graph_optimize: bool = True):
    """Loop tick with SMALL outputs and NO donation.

    The tick only reads the multi-GB keyframe DB and only mutates the small
    graph arrays (factors, poses, counters). The full-state donated variant
    (:func:`make_loop_fn`) makes the runtime hand the whole donated state
    pytree between two alternating executables every cadence period — which
    costs ~15-20 ms/tick in buffer bookkeeping on the tunneled runtime even
    though the tick's compute is ~0.5 ms. Here the DB is a plain read-only
    input and only the mutated fields are outputs, so nothing multi-GB
    crosses the program boundary in either direction.

    Returns ``fn(state, frame) -> ((pg, poses, loop_count, verify_fired,
    verify_fine_fired, verify_bound_hit, pending), det)``; stitch with
    ``state._replace(...)`` on the host (free — it only swaps pytree
    leaves).
    """
    body = _make_loop_body(config, in_graph_optimize)

    @jax.jit
    def loop_fn_split(state: SlamState, frame):
        new_state, det = body(state, frame)
        return (
            new_state.pg,
            new_state.poses,
            new_state.loop_count,
            new_state.verify_fired,
            new_state.verify_fine_fired,
            new_state.verify_bound_hit,
            new_state.pending_optimize,
        ), det

    return loop_fn_split


def make_multi_tick_fn(config: SlamConfig, in_graph_optimize: bool = True):
    """Several loop-cadence ticks in ONE dispatch (split-style outputs).

    With ``dispatch_block`` > ``loop_check_every`` several cadence frames
    fall inside one block; running their queries bunched after the block is
    DETECTION-EXACT (lc.detect's explicit-query form: the candidate mask is
    one-sided in frame index, verification ICP reads only stored clouds —
    never poses) and replaces ``n_ticks`` tick dispatches with one. Each
    dispatch costs a blocking ~10-20 ms RPC over the TPU tunnel, which at
    full scale had become the dominant non-compute cost.

    Pass ``frames`` of a FIXED length (the jit specializes on it) with -1
    for unused slots (boundary blocks) — a -1 query rejects every candidate.

    Returns ``fn(state, frames) -> (pg, poses, loop_count, verify_fired,
    verify_fine_fired, verify_bound_hit, pending)``; stitch with
    ``state._replace`` on the host. Only the small mutated arrays cross the
    program boundary (see make_loop_fn_split).
    """
    body = _make_loop_body(config, in_graph_optimize)

    @jax.jit
    def multi_tick_fn(state: SlamState, frames):
        # Scan carry = only the small mutated fields; the multi-GB DB rides
        # as a closed-over loop invariant (a full-state carry would make XLA
        # thread GB-scale pass-through buffers through the loop).
        def tick(small, f):
            pg_s, poses, lc_n, vf_n, vff_n, vbh_n, pend = small
            st = state._replace(
                pg=pg_s, poses=poses, loop_count=lc_n,
                verify_fired=vf_n, verify_fine_fired=vff_n,
                verify_bound_hit=vbh_n, pending_optimize=pend,
            )
            st, _ = body(st, f)
            return (
                st.pg, st.poses, st.loop_count, st.verify_fired,
                st.verify_fine_fired, st.verify_bound_hit,
                st.pending_optimize,
            ), ()

        init = (
            state.pg, state.poses, state.loop_count, state.verify_fired,
            state.verify_fine_fired, state.verify_bound_hit,
            state.pending_optimize,
        )
        out, _ = jax.lax.scan(tick, init, frames.astype(jnp.int32))
        return out

    return multi_tick_fn


def make_optimize_fn(config: SlamConfig):
    """Pose-graph optimization (run_pose_graph_optimization, slam_node.cpp:177-185).

    The grid is intentionally NOT rebuilt here (reference quirk #7)."""

    def optimize_body(state: SlamState):
        res = pg.optimize(
            state.pg._replace(poses=state.poses), config.pg,
            max_iterations=config.pg.inline_max_iterations,
        )
        idx = jnp.arange(state.poses.shape[0])
        poses = jnp.where(
            (idx < state.n_poses)[:, None, None], res.poses, state.poses
        )
        state = state._replace(
            poses=poses, pending_optimize=jnp.logical_not(res.converged)
        )
        return state, res

    return functools.partial(jax.jit, donate_argnums=0)(optimize_body)


def make_finalize_fn(config: SlamConfig):
    """End-of-run occupancy rebuild (build_final_global_map,
    slam_node.cpp:196-209, rebuild_occupancy_grid :223-229).

    The final optimize (slam_node.cpp:103-108) is NOT in this program: the
    engine drives it host-chunked first (SlamEngine.finalize) so no single
    dispatch runs unbounded LM x CG at full scale."""

    @functools.partial(jax.jit, donate_argnums=0)
    def finalize_fn(state: SlamState):
        F = state.poses.shape[0]

        def body(f, carry):
            grid, dropped = carry
            pose = state.poses[f]
            cloud = state.db.clouds[f]
            m = state.db.cloud_mask[f] & (f < state.n_poses)
            world = se3.apply(pose, cloud)
            grid, d = update_occupancy(
                grid, world, m, se3.trans(pose)[:2], config.grid
            )
            return grid, dropped + d

        grid, dropped = jax.lax.fori_loop(
            0, F, body, (jnp.zeros_like(state.grid), jnp.int32(0))
        )
        return state._replace(grid=grid, occ_dropped=dropped)

    return finalize_fn


def enable_compilation_cache(path: str = "/tmp/lidar_slam_jax_cache") -> None:
    """Persistent XLA compilation cache — step-function compiles run ~2 min on
    TPU; cached reruns start instantly."""
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass


class SlamEngine:
    """Host driver: feeds scans to the jitted pipeline and exports artifacts.

    Replaces the ROS2 node + timer + publishers (slam_node.cpp:83-116,
    231-297) with a plain Python loop; "topics" become savable artifacts
    (utils/export.py).
    """

    def __init__(self, config: SlamConfig):
        enable_compilation_cache()
        self.config = config
        self._init_fn = make_init_fn(config)
        self._step_fn = make_step_fn(config)
        self._loop_fn = make_loop_fn_split(
            config, in_graph_optimize=config.optimize_midrun
        )
        self._optimize_fn = make_optimize_fn(config)
        self._finalize_fn = make_finalize_fn(config)
        self._block = max(config.dispatch_block, 0)
        self._n_ticks = 1
        self._multi_tick_fn = None
        if self._block > 1:
            cad = config.loop_check_every
            if self._block % cad == 0:
                # block SPANS several cadence periods: run the covered
                # queries bunched in one multi-tick dispatch after each
                # block (detection-exact — see make_multi_tick_fn)
                self._n_ticks = self._block // cad
                if self._n_ticks > 1:
                    self._multi_tick_fn = make_multi_tick_fn(
                        config, in_graph_optimize=config.optimize_midrun
                    )
            elif cad % self._block != 0:
                raise ValueError(
                    f"dispatch_block={self._block} must divide or be a "
                    f"multiple of loop_check_every={cad} so loop detection "
                    "stays on the reference cadence"
                )
            self._block_fn = make_block_step_fn(config, self._block)
        self._pending: list = []  # buffered (raw, count[, normals]) tuples
        self._resident = None     # (scans_dev (T,N,3), counts_dev (T,))
        self._resident_normals = None  # (T,N,3) host-normal store (optional)
        self._resident_frame0 = 0  # dataset frame index of store row 0
        self._resident_block_fn = None
        self.state = init_state(config)
        self._frame = 0

    def reset(self) -> None:
        """Blank the SLAM state without rebuilding the jitted programs.

        Re-creating the engine re-traces + recompiles (or re-deserializes)
        every program; ``reset`` keeps them so repeated runs in one process
        (benchmark repetitions, multi-sequence evaluation) pay compilation
        once."""
        self._pending.clear()
        self.state = init_state(self.config)
        self._frame = 0

    # -- scan feeding ------------------------------------------------------

    def pad_scan(self, pts: np.ndarray):
        cap = (
            self.config.max_points
            if self.config.host_voxelize
            else self.config.max_raw_points
        )
        n = min(len(pts), cap)
        out = np.zeros((cap, 3), np.float32)
        out[:n] = pts[:n]
        return jnp.asarray(out), jnp.int32(n)

    def _pad_scan_np(self, pts: np.ndarray):
        """Host-side padding WITHOUT a device put (block mode buffers numpy
        and uploads one stacked block — every host->device call is a
        blocking ~9 ms RPC on the tunneled runtime, so per-scan puts cost
        more than the step compute itself)."""
        cap = (
            self.config.max_points
            if self.config.host_voxelize
            else self.config.max_raw_points
        )
        n = min(len(pts), cap)
        out = np.zeros((cap, 3), np.float32)
        out[:n] = pts[:n]
        return out, np.int32(n)

    def push_scan(self, pts: np.ndarray, sync_info: bool = False,
                  normals: Optional[np.ndarray] = None) -> Optional[dict]:
        """Process one raw scan (host entry point).

        Loop detection + conditional optimization run fully on device at the
        reference cadence; no host sync happens unless ``sync_info`` is set
        (each sync costs ~50 ms over a TPU tunnel). With ``sync_info=True``
        a dict describing any accepted detection is returned.

        ``normals``: host-computed per-point normals (config.host_normals)."""
        block_mode = self._block > 1 and self._frame > 0
        if block_mode:
            raw, count = self._pad_scan_np(pts)
        else:
            raw, count = self.pad_scan(pts)
        kw = {}
        nrm_arr = None
        if self.config.host_normals:
            cap = raw.shape[0]
            nrm = np.zeros((cap, 3), np.float32)
            if normals is not None:
                n = min(len(normals), cap)
                nrm[:n] = normals[:n]
            else:
                from ..utils.native import normals_radius_host

                n = min(len(pts), cap)
                nrm[:n] = normals_radius_host(
                    pts[:n], self.config.effective_normal_radius
                )
            nrm_arr = nrm if block_mode else jnp.asarray(nrm)
            if not block_mode:
                kw["raw_normals"] = nrm_arr
        info = None
        if self._frame == 0:
            self.state = self._init_fn(self.state, raw, count, **kw)
        else:
            if self._block > 1:
                if not self._pending:
                    self._pending_frame0 = self._frame
                self._pending.append((raw, count, nrm_arr))
                if self._frame % self._block == 0:
                    self._dispatch_pending()
            else:
                self.state = self._step_fn(
                    self.state, raw, count, jnp.int32(self._frame), **kw
                )
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
                (pg_s, poses, lc_n, vf_n, vff_n, vbh_n, pend), det = (
                    self._loop_fn(self.state, jnp.int32(self._frame))
                )
                self.state = self.state._replace(
                    pg=pg_s, poses=poses, loop_count=lc_n,
                    verify_fired=vf_n, verify_fine_fired=vff_n,
                    verify_bound_hit=vbh_n, pending_optimize=pend,
                )
                if sync_info:
                    acc = np.asarray(det.accepted)
                    if acc.any():
                        info = {
                            "found": int(acc.sum()),
                            "query": int(det.query_frame),
                            "matches": np.asarray(det.match_frame)[acc].tolist(),
                        }
        self._frame += 1
        return info

    def _run_ticks(self, lo: int, hi: int) -> None:
        """Run every loop-cadence tick whose frame falls in [lo, hi].

        One multi-tick dispatch when the engine was built with
        ``dispatch_block`` spanning several cadence periods, else one split
        tick per frame (at block <= cadence the range holds at most one)."""
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
        else:
            for fr in frames:
                (pg_s, poses, lc_n, vf_n, vff_n, vbh_n, pend), _ = (
                    self._loop_fn(self.state, jnp.int32(fr))
                )
                self.state = self.state._replace(
                    pg=pg_s, poses=poses, loop_count=lc_n,
                    verify_fired=vf_n, verify_fine_fired=vff_n,
                    verify_bound_hit=vbh_n, pending_optimize=pend,
                )

    def _dispatch_pending(self) -> None:
        """Run the buffered scans: one block dispatch when full, per-scan
        steps for a partial tail (end of dataset / pre-flush). With
        multi-tick blocks (dispatch_block > loop_check_every) the covered
        cadence ticks run here, right after the block."""
        if not self._pending:
            return
        n = len(self._pending)
        frame0 = self._pending_frame0
        if n == self._block:
            # ONE host->device put for the whole block (numpy stack on host):
            # per-scan puts are blocking ~9 ms RPCs on the tunneled runtime.
            raws = jnp.asarray(np.stack([p[0] for p in self._pending]))
            counts = jnp.asarray(np.stack([p[1] for p in self._pending]))
            kw = {}
            if self._pending[0][2] is not None:
                kw["raw_normals_blk"] = jnp.asarray(
                    np.stack([p[2] for p in self._pending])
                )
            self.state = self._block_fn(
                self.state, raws, counts, jnp.int32(frame0), **kw
            )
        else:
            for k, (raw, count, nrm) in enumerate(self._pending):
                kw = {} if nrm is None else {"raw_normals": jnp.asarray(nrm)}
                self.state = self._step_fn(
                    self.state, jnp.asarray(raw), jnp.int32(count),
                    jnp.int32(frame0 + k), **kw
                )
        self._pending.clear()
        if self._n_ticks > 1:
            self._run_ticks(frame0, frame0 + n - 1)

    # -- resident-scan execution (transfer-free steady state) ---------------

    def preload(self, scans: list, normals: Optional[list] = None,
                frame0: int = 0) -> None:
        """Upload all prepared scans to the device ONCE as a (T, N, 3) store.

        ``frame0``: the dataset frame index of ``scans[0]`` — pass the resume
        frame when preloading only the unprocessed tail of a dataset (row
        ``i`` of the store is frame ``frame0 + i``).

        Call BEFORE any result fetch: on tunneled runtimes a single
        device->host fetch permanently degrades upload bandwidth ~30x (see
        :func:`make_resident_block_fn`), so the one big healthy-bandwidth
        transfer here is the last host->device data movement the run needs.
        ``run_preloaded`` then drives the whole pipeline with scalar-only
        operands.

        ``normals``: per-scan host-computed normals, same row indexing as
        ``scans`` (config.host_normals — e.g. utils.native.normals_knn_host
        from the C++ prefetch workers); uploaded as a second resident
        store."""
        if self.config.host_normals and normals is None:
            raise ValueError("config.host_normals: pass preload(..., normals)")
        cap = (
            self.config.max_points
            if self.config.host_voxelize
            else self.config.max_raw_points
        )
        T = len(scans)
        cnt = np.zeros((T,), np.int32)
        # Chunked upload + on-device assembly: a single multi-GB transfer
        # falls off a tunnel-runtime bandwidth cliff (measured: 0.55 GiB at
        # ~550 MB/s but 1.65 GiB at ~12 MB/s); ~128 MiB chunks stay on the
        # fast path and dynamic_update_slice assembles them into the
        # preallocated store with donated in-place writes.
        rows = max(1, (128 * 2**20) // (cap * 12))
        write = functools.partial(jax.jit, donate_argnums=0)(
            lambda b, c, i: jax.lax.dynamic_update_slice_in_dim(b, c, i, 0)
        )

        def upload(items, fill_count=False):
            store = jnp.zeros((T, cap, 3), jnp.float32)
            for s0 in range(0, T, rows):
                hi = min(s0 + rows, T)
                chunk = np.zeros((hi - s0, cap, 3), np.float32)
                for i in range(s0, hi):
                    m = min(len(items[i]), cap)
                    chunk[i - s0, :m] = items[i][:m]
                    if fill_count:
                        cnt[i] = m
                store = write(store, jnp.asarray(chunk), jnp.int32(s0))
            return store

        store = upload(scans, fill_count=True)
        self._resident_normals = (
            upload(normals) if normals is not None else None
        )
        self._resident = (store, jnp.asarray(cnt))
        if getattr(self, "_resident_frame0", 0) != frame0:
            self._resident_block_fn = None  # offset is baked into the jit
        self._resident_frame0 = frame0
        if self._block > 1 and self._resident_block_fn is None:
            self._resident_block_fn = make_resident_block_fn(
                self.config, self._block, frame_offset=frame0
            )

    def run_preloaded(self) -> None:
        """Process every preloaded scan (same math and loop cadence as
        ``push_scan`` streaming, zero steady-state host->device transfers)."""
        if self._resident is None:
            raise ValueError("call preload(scans) first")
        scans, counts = self._resident
        nrm = getattr(self, "_resident_normals", None)
        row0 = getattr(self, "_resident_frame0", 0)  # frame index of row 0
        if self._frame < row0:
            raise ValueError(
                f"preload(frame0={row0}) starts past engine frame "
                f"{self._frame} — preload the missing frames too"
            )
        T = int(scans.shape[0])  # rows; frames covered: row0 .. row0+T-1
        if self._frame == 0 and T > 0:
            kw0 = {} if nrm is None else {"raw_normals": nrm[0]}
            self.state = self._init_fn(self.state, scans[0], counts[0], **kw0)
            self._frame = 1
        B = self._block if self._block > 1 else 1
        f = self._frame
        while f < row0 + T:
            lo = f
            r = f - row0
            if B > 1 and r + B <= T:
                kw = {} if nrm is None else {"normals": nrm}
                self.state = self._resident_block_fn(
                    self.state, scans, counts, jnp.int32(r), **kw
                )
                f += B
            else:
                kw = {} if nrm is None else {"raw_normals": nrm[r]}
                self.state = self._step_fn(
                    self.state, scans[r], counts[r], jnp.int32(f), **kw
                )
                f += 1
            self._run_ticks(lo, f - 1)
        self._frame = row0 + T

    def flush(self) -> None:
        """Make ``state`` current: dispatch any buffered scans (block mode).

        Called automatically by finalize/trajectory/metrics/map/checkpoint;
        call manually before reading ``state`` directly mid-run."""
        if self._pending:
            self._dispatch_pending()

    def finalize(self, timing: Optional[dict] = None):
        """Final optimize to convergence + occupancy rebuild
        (slam_node.cpp:103-108). The optimize runs host-chunked —
        ``inline_max_iterations`` LM iterations per dispatch — so no single
        program runs unbounded at full scale; the rebuild is one dispatch.

        ``timing``: optional dict populated with per-stage wall seconds
        (``flush`` / ``optimize`` / ``rebuild``, each honestly synced)."""
        t0 = time.perf_counter()
        self.flush()
        if timing is not None:
            np.asarray(self.state.n_poses)  # honest sync (PERF.md gotcha #2)
            timing["flush"] = time.perf_counter() - t0
            t0 = time.perf_counter()
        res = pg.optimize_chunked(
            self.state.pg._replace(poses=self.state.poses), self.config.pg,
            chunk=self.config.pg.inline_max_iterations,
            timing=timing,
        )
        idx = jnp.arange(self.state.poses.shape[0])
        poses = jnp.where(
            (idx < self.state.n_poses)[:, None, None],
            res.poses, self.state.poses,
        )
        self.state = self.state._replace(
            poses=poses, pending_optimize=jnp.bool_(False)
        )
        if timing is not None:
            np.asarray(self.state.n_poses)
            timing["optimize"] = time.perf_counter() - t0
            t0 = time.perf_counter()
        self.state = self._finalize_fn(self.state)
        if timing is not None:
            np.asarray(self.state.n_poses)
            timing["rebuild"] = time.perf_counter() - t0
        return res

    # -- results -----------------------------------------------------------

    @property
    def n_frames(self) -> int:
        return self._frame

    def trajectory(self) -> np.ndarray:
        """(n, 4, 4) pose array."""
        self.flush()
        n = int(self.state.n_poses)
        return np.asarray(self.state.poses[:n])

    def metrics(self) -> dict:
        self.flush()
        n = int(self.state.n_poses)
        return {
            "icp_error": np.asarray(self.state.icp_error[:n]),
            "icp_iters": np.asarray(self.state.icp_iters[:n]),
            "icp_converged": np.asarray(self.state.icp_converged[:n]),
            "frame_npts": np.asarray(self.state.frame_npts[:n]),
            "loop_count": int(self.state.loop_count),
            # loop-detection ticks whose SC gate passed candidates into ICP
            # verification (firing ticks dominate loop-machinery cost)
            "verify_fired": int(self.state.verify_fired),
            # firing ticks where >=1 lane survived the coarse early-reject
            # gate into the fine verify loop (== verify_fired when
            # lc.verify_coarse_reject == 0)
            "verify_fine_fired": int(self.state.verify_fine_fired),
            # firing ticks where the bounded tranche walk stopped short of
            # the reference's unbounded verify-until-accepted walk
            # (loop_closure.hpp:96-123) — nonzero means the engine may
            # accept fewer loops than the reference; raise
            # lc.verify_extra_tranches if it correlates with lost loops
            "verify_bound_hit": int(self.state.verify_bound_hit),
            # accepted loops dropped because max_loop_factors was exhausted
            "loops_dropped": int(self.state.pg.n_loops_dropped),
            # in-range points whose cell fell outside the occupancy grid —
            # nonzero means the trajectory outgrew grid_dim (shift origin_*
            # or raise grid_dim; the reference's hash set is unbounded)
            "occ_dropped": int(self.state.occ_dropped),
        }

    def global_map(self, max_points_per_frame: Optional[int] = None) -> np.ndarray:
        """Assemble the world-frame map from stored clouds + poses
        (build_final_global_map, slam_node.cpp:196-209).

        The gather + pose transform run on device in frame blocks — one
        dispatch and one host fetch per 256 frames instead of one per frame
        (a per-frame fetch costs ~50 ms over a TPU tunnel; at KITTI's 4.5k
        frames that would be minutes)."""
        n = int(self.state.n_poses)
        if n == 0:
            return np.zeros((0, 3), np.float32)
        N = self.state.db.clouds.shape[1]
        ppf = min(max_points_per_frame or N, N)
        BLOCK = min(256, self.state.poses.shape[0])

        @functools.partial(jax.jit, static_argnames=("ppf",))
        def map_block(poses, clouds, masks, f0, ppf):
            poses_b = jax.lax.dynamic_slice_in_dim(poses, f0, BLOCK)
            clouds_b = jax.lax.dynamic_slice_in_dim(clouds, f0, BLOCK)
            masks_b = jax.lax.dynamic_slice_in_dim(masks, f0, BLOCK)
            if ppf < clouds_b.shape[1]:
                # batched form of the shared strided-prefix subsample
                sel = strided_prefix_idx(jnp.sum(masks_b, axis=1), ppf)
                clouds_b = jnp.take_along_axis(clouds_b, sel[:, :, None], axis=1)
                masks_b = jnp.take_along_axis(masks_b, sel, axis=1)
            world = se3.apply(poses_b, clouds_b)
            return world, masks_b

        out = []
        for f0 in range(0, n, BLOCK):
            world, m = map_block(
                self.state.poses, self.state.db.clouds,
                self.state.db.cloud_mask, jnp.int32(f0), ppf,
            )
            world = np.asarray(world)
            m = np.asarray(m)
            hi = min(BLOCK, n - f0)
            for b in range(hi):
                out.append(world[b][m[b]])
        return np.concatenate(out, axis=0) if out else np.zeros((0, 3), np.float32)

    def occupancy(self) -> np.ndarray:
        self.flush()
        return np.asarray(self.state.grid)

    # -- checkpoint / resume (no reference analog; SURVEY.md §5) ------------

    def save_checkpoint(self, path: str) -> None:
        self.flush()
        from ..utils.checkpoint import save_state

        save_state(path, self.state, extra={"frame": self._frame})

    def load_checkpoint(self, path: str) -> None:
        from ..utils.checkpoint import load_state

        # Scans buffered for block dispatch belong to the PRE-load run; if
        # they were dispatched after the restore they would land on the
        # restored state with wrong frame indices.
        self._pending.clear()
        self.state, extra = load_state(path, self.state)
        self._frame = int(extra.get("frame", 0))
