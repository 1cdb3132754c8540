"""Configuration tree for the TPU-native LiDAR SLAM framework.

All configs are frozen (hashable) dataclasses so they can be passed as static
arguments to jit-compiled step functions. Field names and defaults mirror the
reference system's effective runtime values:

- ICP defaults:        reference types.hpp:143-148
- Scan Context:        reference scan_context.hpp:27-29 (20 rings x 60 sectors, 80 m)
- Loop closure:        reference loop_closure.hpp:14-19 with the node's override of
                       sc_distance_threshold=0.2 (slam_node.cpp:77-81)
- Pose graph sigmas:   reference pose_graph.hpp:22-40
- Occupancy grid:      reference slam_node.hpp:35-40 and slam_node.cpp:211-221
- SLAM node params:    reference slam_node.cpp:17-35 (voxel_size, max_iterations,
                       tolerance, min_points=1000 from slam_node.hpp:29)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class ICPConfig:
    """Point-to-plane ICP settings (reference types.hpp:143-148)."""

    max_iterations: int = 50
    tolerance: float = 1e-6        # convergence threshold on |error change|
    min_error: float = 1e-9        # stop if RMS plane error falls below this
    normal_k: int = 20             # kNN size for normal estimation (icp.hpp:26)
    solver_damping: float = 1e-9   # Tikhonov term on the 6x6 normal equations (f32 safety)
    # 0 = register every source point (reference behavior); >0 = strided
    # source subsample for the correspondence search/solve — 6-DoF needs only
    # a few thousand constraints, and the per-iteration 1-NN cost is linear
    # in source size. Error/fitness is then computed over the subsample.
    sample_points: int = 0
    # 0 = search the full target cloud (reference behavior); >0 = strided
    # target subsample for the correspondence search. Point-to-PLANE
    # tolerates a coarser match set: the plane constraint absorbs the
    # in-plane offset to the skipped neighbor, so halving the target costs
    # ~zero ATE while the 1-NN pass (linear in target size) halves.
    target_points: int = 0
    # Coarse-to-fine warm start: run this many fixed GN iterations on a
    # ``coarse_sample``-point source subset before the main loop (correspondence
    # cost is linear in source size; early iterations don't need density).
    # 0 = off (reference behavior). Convergence bookkeeping covers the fine
    # phase only.
    coarse_iterations: int = 0
    coarse_sample: int = 2048
    # Seed odometry ICP with the PREVIOUS frame's accepted delta (constant-
    # velocity motion model) instead of the reference's identity init
    # (icp.hpp:174) — typically halves the iteration count and keeps the
    # first correspondence pass inside pruned-search windows. Disclosed
    # improvement; off = reference behavior.
    warm_start: bool = False


@dataclass(frozen=True)
class ScanContextConfig:
    """Scan Context descriptor geometry (reference scan_context.hpp:27-29,59)."""

    num_rings: int = 20
    num_sectors: int = 60
    max_range: float = 80.0
    min_range: float = 0.1


@dataclass(frozen=True)
class LoopClosureConfig:
    """Two-stage loop-closure detection (reference loop_closure.hpp:14-19).

    ``sc_distance_threshold`` defaults to the node's effective override of 0.2
    (slam_node.cpp:79), not the struct default 0.25 (SURVEY.md quirk #6).
    """

    frame_gap: int = 50
    sc_distance_threshold: float = 0.2
    icp_fitness_threshold: float = 0.3
    max_candidates: int = 3
    icp_max_iterations: int = 30       # loop verification budget (loop_closure.hpp:106)
    # Verify-until-accepted depth (loop_closure.hpp:96-123): how many extra
    # gated tranches of ``max_candidates`` may be verified when the first
    # tranche accepts fewer than ``max_candidates``. 0 = verify exactly the
    # top-K (round-1 behavior).
    verify_extra_tranches: int = 1
    yaw_seed: bool = False             # improvement: seed verify-ICP yaw from best SC shift
    ring_key_prefilter: int = 0        # improvement: >0 = prefilter DB by ring-key top-k
    # >0: subsample the verify-ICP SOURCE to this many points. The fitness
    # threshold (0.3) assumes full-density targets — keep DB clouds at full
    # resolution and sample only the query side for speed.
    verify_sample: int = 0
    verify_tolerance: float = 1e-6     # verify-ICP |delta-error| tolerance
    # Coarse-to-fine verification warm start: run this many fixed GN
    # iterations on a ``verify_coarse_sample``-point source subset before the
    # full-sample verify loop (ICPConfig.coarse_iterations semantics). The
    # vmapped verify while_loop runs lockstep to the SLOWEST candidate lane
    # (6-11 iterations from identity at full-scale loop offsets), and each
    # lane-iteration is a full 1-NN pass — cheap coarse steps cut the
    # lockstep fine-phase count roughly in half at ~1/8 the per-step cost.
    # 0 = off (reference behavior: identity init, loop_closure.hpp:105-109).
    verify_coarse_iterations: int = 0
    verify_coarse_sample: int = 512
    # >0: coarse-phase EARLY REJECT (requires verify_coarse_iterations > 0).
    # After the coarse warm start, each candidate lane's coarse-sample plane
    # RMS is compared against this threshold; lanes above it are marked
    # hopeless and the expensive fine verify loop (up to icp_max_iterations
    # of full-sample 1-NN, run in vmapped LOCKSTEP — a single non-converging
    # false candidate pins the whole tranche at the full budget) skips them;
    # a tranche whose lanes are ALL hopeless skips the fine phase entirely.
    # Rejected lanes report converged=False / fitness=inf — the same verdict
    # the reference's 30-iteration walk hands a non-converging candidate
    # (loop_closure.hpp:110-123), reached at a few percent of the cost. The
    # threshold must sit well above every to-be-accepted lane's coarse RMS
    # (tools/profile_ring_loops.py measures the margin per world; the accept
    # set is equivalence-measured in PERF.md before a value ships).
    # 0 = off (every candidate gets the full fine budget).
    verify_coarse_reject: float = 0.0


@dataclass(frozen=True)
class PoseGraphConfig:
    """SE(3) pose-graph LM settings (reference pose_graph.hpp:22-40).

    The backend is a from-scratch JAX Levenberg-Marquardt optimizer (the
    reference delegates to GTSAM, pose_graph.cpp:147-171); ``error`` matches
    GTSAM's convention of 0.5 * sum of squared whitened residuals.
    """

    odom_rotation_sigma: float = 0.01
    odom_translation_sigma: float = 0.05
    prior_rotation_sigma: float = 0.001
    prior_translation_sigma: float = 0.001
    loop_rotation_sigma: float = 0.005
    loop_translation_sigma: float = 0.025
    max_iterations: int = 100
    relative_error_tol: float = 1e-5
    absolute_error_tol: float = 1e-5
    # TPU-native solver knobs (no reference analog — GTSAM used direct solves):
    # Relative (incremental) parameterization: corrections act on the per-step
    # relative transforms and poses are rebuilt by a parallel-prefix
    # associative_scan of SE(3) composition. In absolute per-pose coordinates
    # the odometry chain's normal matrix is block-tridiagonal, and CG — whose
    # Krylov space grows one chain hop per iteration — cannot propagate a
    # loop-closure correction across a 4,500-pose graph in any sane budget
    # (measured: 0 accepted LM steps at KITTI scale). In relative coordinates
    # a loop residual couples every step in its range in ONE hop, so CG
    # converges in tens of iterations at any graph length.
    relative_param: bool = True
    # Per-DISPATCH LM bound for optimizations embedded in a larger program
    # (the loop-cadence in-graph optimize and the standalone optimize_fn).
    # An unbounded full-scale first correction runs minutes of LM x CG inside
    # one dispatch and the tunneled TPU runtime kills the worker as hung;
    # unconverged chunks set pending_optimize so the next cadence tick (or a
    # host-driven optimize_chunked) continues from the current poses.
    # Default 3: each Woodbury LM iteration costs ~24 ms at capacity
    # (the 6Lx6L Cholesky dominates), so every-find in-graph optimization at
    # 10 iterations was ~30% of full-run wall time; 3 keeps the reference's
    # optimize-on-every-find semantics (slam_node.cpp:112-115) at ~1/3 the
    # cost with IDENTICAL final ATE (the finalize-time f64 polish dominates
    # accuracy at any inline setting — measured 1,500-frame sweep, ATE
    # 2.161 m at inline 0/1/3/10).
    inline_max_iterations: int = 3
    # Loop-factor window for the IN-GRAPH optimize-on-find chunk only.
    # Static shapes pin the Woodbury K-Cholesky to (6*max_loop_factors)^2
    # per LM iteration regardless of the accepted count; windowing the
    # inline chunk to the newest W loops makes it (6W)^2 (8x cheaper at
    # 256 vs the 512 capacity) while finalize still polishes with EVERY
    # factor. Exact while n_loops <= window (KITTI seq 00 accepts ~150);
    # past that the inline step ignores the oldest loops — harmless, since
    # inline accuracy doesn't shape final ATE (measured identical at
    # inline 0/1/3/10; the finalize polish dominates). 0 = full capacity.
    inline_loop_window: int = 256
    # Inner linear solver per LM step (relative_param only):
    # 'woodbury' (default) = EXACT damped-GN solve. J^T J + lam I is
    #   diagonal + rank-6L in relative coordinates (prior/odometry rows are
    #   diagonal blocks; each loop couples its frame range through one
    #   adjoint prefix-sum), so Woodbury reduces the solve to one cumsum
    #   over frames + a 6Lx6L Cholesky — the TPU-native analog of GTSAM's
    #   direct sparse solve. Measured at 4,500 poses: CG stalled at 100 LM
    #   iterations / 142 s; woodbury converges in a handful of exact steps.
    # 'cg' = matrix-free PCG on the autodiff-linearized system (fallback,
    #   and the only path when relative_param=False).
    # At KITTI extents the f32 woodbury steps stall (K needs ~1e-11 relative
    # precision); optimize_chunked then escalates to the ON-DEVICE
    # emulated-f64 LM (pose_graph.optimize_dd, double-single arithmetic)
    # and finally to the NumPy-f64 host backstop.
    solver: str = "woodbury"
    # emulated-f64 K-solve tier (optimize_dd): 'direct' (default) =
    # backward-stable DD Cholesky (any conditioning, O((6L)^3) sequential
    # DD work — loop compaction keeps L small); 'pcg' = host-driven
    # f32-preconditioned DD PCG (df64.solve_pcg_staged, O(N^2)/iteration —
    # ~1000x cheaper at engine scale) whose FORWARD-error floor
    # (kappa~ * eps_dd ~ 2e-7) is not backward-consistent and breaks the
    # Woodbury back-substitution at harsh states; optimize_dd retries with
    # 'direct' from the original poses when it stalls. See
    # df64.solve_pcg's docstring for the path to making 'pcg' primary.
    dd_solve: str = "direct"
    cg_iterations: int = 120           # PCG budget per LM step (matrix-free J^T J)
    cg_tolerance: float = 1e-10        # relative to |b|^2
    lambda_init: float = 1e-5          # GTSAM LevenbergMarquardtParams default
    lambda_factor: float = 10.0
    lambda_max: float = 1e7


@dataclass(frozen=True)
class OccupancyGridConfig:
    """Occupancy-grid mapping (reference slam_node.hpp:35-40, slam_node.cpp:211-221)."""

    resolution: float = 0.2
    height_min: float = 0.3
    height_max: float = 2.0
    max_range: float = 40.0
    min_range: float = 0.5             # hardcoded r < 0.5 skip (slam_node.cpp:216)
    # Fixed world grid (cells), centered at (origin_x, origin_y). The
    # reference's cell store is an UNBOUNDED hash set (slam_node.hpp:45-59);
    # a dense array must bound it — 8192 x 0.2 m covers +-819.2 m, beyond
    # KITTI seq 00's extents. Out-of-bounds points are COUNTED
    # (SlamState.occ_dropped / metrics()['occ_dropped']), never silently
    # dropped; shift origin_* or raise grid_dim if the counter is nonzero.
    grid_dim: int = 8192
    origin_x: float = 0.0
    origin_y: float = 0.0

    @property
    def patch_dim(self) -> int:
        """Per-scan update patch (cells): the sensor-centered square that
        covers max_range, rounded to a lane multiple (ops/occupancy.py)."""
        need = int(2.0 * self.max_range / self.resolution) + 16
        return min(self.grid_dim, -(-need // 128) * 128)


@dataclass(frozen=True)
class SlamConfig:
    """Top-level pipeline config (reference slam_node.cpp:17-35, slam_node.hpp:25-30).

    Static shape capacities (``max_raw_points``, ``max_points``, ``max_frames``,
    ``max_loop_factors``) replace the reference's dynamic std::vectors; every
    per-scan array is padded to these and carries a validity mask.
    """

    voxel_size: float = 0.5
    min_points: int = 1000             # frame-skip guard (slam_node.cpp:125-130)
    divergence_error: float = 1.0      # ICP fallback threshold (slam_node.cpp:139-140)
    loop_check_every: int = 10         # detect cadence (slam_node.cpp:160)
    loop_start_frame: int = 50         # frame_idx > 50 gate (slam_node.cpp:160)

    # Static capacities
    max_raw_points: int = 131072
    max_points: int = 32768            # downsampled cloud pad size
    lc_cloud_points: int = 0           # keyframe-DB cloud size; 0 = use max_points
    max_frames: int = 4608
    max_loop_factors: int = 512

    icp: ICPConfig = ICPConfig()
    sc: ScanContextConfig = ScanContextConfig()
    lc: LoopClosureConfig = LoopClosureConfig()
    pg: PoseGraphConfig = PoseGraphConfig()
    grid: OccupancyGridConfig = OccupancyGridConfig()

    # Mid-run optimize-on-find (slam_node.cpp:112-115). False defers ALL
    # pose-graph optimization to finalize: detection-exact (lc.detect's
    # candidate mask is frame-index-based and verification ICP reads only
    # stored clouds, never poses) and final-ATE-exact (finalize optimizes
    # the same factor graph to convergence either way; mid-run optimize
    # only changes the warm start it converges from). What it costs is the
    # LIVE pose estimate between finds — the reference optimizes mid-run
    # for its real-time published map, so True is the parity default; a
    # throughput-first offline run saves an ~70 ms bounded LM chunk per
    # firing tick by deferring (tools/profile_firing.py).
    optimize_midrun: bool = True

    # 'auto' (= pallas on TPU, xla elsewhere; both exact brute force),
    # or the opt-in pruned searches 'slab' / 'grid' / 'slab_pallas' — see
    # models.pipeline._resolve_nn1 for the accuracy trade-offs.
    knn_backend: str = "auto"
    # 'slab_pallas' contiguous-window width (target points considered per
    # source tile); must be a multiple of 128.
    slab_window: int = 4096

    # >1: the engine dispatches this many scans per device call (lax.scan
    # over the step body) — the fixed per-dispatch cost (~2.5-6 ms over a
    # TPU tunnel) is paid once per block instead of once per frame. Must
    # divide ``loop_check_every`` so detection stays on the reference's
    # cadence. 0/1 = one dispatch per scan.
    dispatch_block: int = 0

    # Host-side voxelization: scans arrive already downsampled AND x-major
    # sorted (the native prefetch worker voxelizes off the critical path,
    # overlapped with device compute — the device sort-based voxel op is
    # skipped entirely; both voxelizers emit key-sorted order). Feeding raw
    # UNSORTED clouds through this path breaks the windowed normal
    # accumulator and the slab/grid NN backends — sort by x first.
    host_voxelize: bool = False
    # Host-side normals: scans also arrive with per-point radius normals
    # (computed in the C++ prefetch workers, exact f64 neighborhood math);
    # requires host_voxelize. Saves ~4.5 ms/scan of device time.
    host_normals: bool = False

    # Normal estimation: 'adaptive' (default) = count-targeted per-point
    # radius moment accumulation — emulates the reference's k=20 ranked
    # neighborhood (icp.hpp:26) at moment-kernel cost; required for
    # anisotropic ring-pattern LiDAR, where a fixed metric ball degenerates
    # to a collinear single-ring arc beyond ~25 m (176 mm/frame odometry
    # error vs 11 mm — see ops/normals.estimate_normals_adaptive).
    # 'radius' = fixed metric-ball moments (fastest; fine on uniform-density
    # clouds); 'knn' = reference-exact k=20 ranked PCA (icp.hpp:23-67;
    # 40-140x slower on TPU — sorts). Radius 0 = auto (2.4 * voxel_size);
    # for 'adaptive' that is the per-point minimum.
    normal_method: str = "adaptive"
    normal_radius: float = 0.0
    # 'adaptive' probe scales and the neighbor-count target (reference k).
    normal_probe_lo: float = 2.0
    normal_probe_hi: float = 8.0
    normal_k_target: int = 20
    normal_r_max: float = 20.0
    # >1: compute normals on every stride-th (sorted) point, replicate to
    # neighbors — halves the dominant normals cost at stride=2.
    normal_stride: int = 1
    # >1: run the adaptive COUNT probes on every probe_stride-th target
    # point and replicate the smooth radius field to the skipped rows (the
    # per-point moment PCA itself stays exact). Cuts the probe d2 sweep
    # ~probe_stride x (~40% of adaptive cost) at sub-degree normal impact —
    # see ops/normals.estimate_normals_adaptive(probe_stride=...).
    normal_probe_stride: int = 1
    # >0: x-slab windowed radius-moment accumulation (O(N*window) instead of
    # O(N^2)); EXACT on x-major-sorted clouds (both the device voxelizer and
    # the native host voxelizer emit that order — every engine input path is
    # sorted) as long as the window covers each tile's +-radius x-band.
    # 4096 is ample at 32k points / 0.5 m voxels; only summation-order
    # rounding can differ from the dense path (visible only at two-plane
    # corner points whose normal is ambiguous anyway).
    normal_window: int = 4096

    @property
    def effective_normal_radius(self) -> float:
        return self.normal_radius if self.normal_radius > 0 else 2.4 * self.voxel_size

    @property
    def lc_points(self) -> int:
        n = self.lc_cloud_points if self.lc_cloud_points > 0 else self.max_points
        return min(n, self.max_points)

    def replace(self, **kw) -> "SlamConfig":
        return dataclasses.replace(self, **kw)


def tiny_config(**kw) -> SlamConfig:
    """A small config for tests / dry runs (CPU-friendly shapes)."""
    base = dict(
        max_raw_points=2048,
        max_points=512,
        lc_cloud_points=512,
        max_frames=64,
        max_loop_factors=16,
        min_points=8,
        loop_start_frame=4,
        loop_check_every=2,
        # tolerance relaxed: on sparse synthetic clouds the f32 RMS error
        # oscillates at ~3e-4, so the reference's 1e-6 |delta-error| test
        # (types.hpp:145) never fires; at KITTI density 1e-6 works as-is.
        icp=ICPConfig(max_iterations=12, normal_k=8, tolerance=1e-3),
        # fitness threshold scaled for sparse clouds: plane-RMS at perfect
        # alignment is ~spacing/2 (~0.5 m on sparse synthetic scans); the
        # reference's 0.3 default assumes KITTI density (~0.25 m spacing)
        lc=LoopClosureConfig(
            frame_gap=4, icp_max_iterations=10, icp_fitness_threshold=0.65
        ),
        pg=PoseGraphConfig(max_iterations=25, cg_iterations=60),
        grid=OccupancyGridConfig(grid_dim=256),
    )
    base.update(kw)
    return SlamConfig(**base)
