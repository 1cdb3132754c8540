"""Two-stage loop-closure detection over a fixed-capacity keyframe database.

Replaces the reference LoopClosureDetector (loop_closure.hpp:41-149):
a per-frame database of (Scan Context descriptor, downsampled cloud, frame
index), linear descriptor search, then ICP verification of the best
candidates.

TPU-native design:
- The DB is a set of preallocated per-frame arrays indexed by frame number
  (descriptors (F, R, S), clouds (F, N, 3), masks, an ``in_db`` flag) — DB
  order equals frame order, as in the reference's append-only vectors.
- Stage 1 (retrieval) is ONE matmul: the 60 rolled queries against every
  stored descriptor (ops/scan_context.sc_distances), then a masked top-k —
  the reference's O(frames x 72k MACs) loop (loop_closure.hpp:78-89)
  collapses onto the MXU.
- Stage 2 (verification) vmaps the full ICP kernel over the top-k candidates
  at once, 30 iterations each with identity init (loop_closure.hpp:96-123).

Verify-until-accepted (loop_closure.hpp:96-123): the reference walks
candidates in ascending SC distance until ``max_candidates`` are *accepted* —
unbounded ICP work in the worst case. Here verification runs in gated
tranches of ``max_candidates``: the best K are always verified; the next
tranche(s) only run (one lax.cond each) when fewer than K were accepted and
more valid candidates exist. With the default one extra tranche this matches
the reference's walk over the top 2K candidates at near-zero cost on the
common all-accepted / none-valid paths.

Improvement toggle (off by default for parity): ``yaw_seed=True`` seeds the
verification ICP with the best SC column shift as an initial yaw — the
reference computes this shift and discards it (SURVEY.md quirk #8).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ICPConfig, LoopClosureConfig, ScanContextConfig
from ..ops import se3
from ..ops.icp import _plane_error, icp_point_to_plane, solve_point_to_plane
from ..ops.knn import nn1
from ..ops.scan_context import sc_distances, scan_context, shift_to_yaw
from ..types import PointCloud, strided_prefix_idx


class KeyframeDB(NamedTuple):
    """Per-frame keyframe storage (loop_closure.hpp:53-59, 143-148).

    ``normals`` caches each scan's per-point normals so loop verification
    reuses them — the reference recomputes target normals inside every
    verification ICP (icp.hpp:166-171); here they're already computed once
    per scan by the odometry step."""

    desc: jnp.ndarray        # (F, R, S)
    desc_norm: jnp.ndarray   # (F,)
    clouds: jnp.ndarray      # (F, N, 3)
    cloud_mask: jnp.ndarray  # (F, N)
    normals: jnp.ndarray     # (F, N, 3)
    in_db: jnp.ndarray       # (F,) bool — frame was addFrame'd
    last_frame: jnp.ndarray  # () int32 — most recently added frame (-1 = none)


def init_db(max_frames: int, n_points: int, sc: ScanContextConfig) -> KeyframeDB:
    return KeyframeDB(
        desc=jnp.zeros((max_frames, sc.num_rings, sc.num_sectors), jnp.float32),
        desc_norm=jnp.zeros((max_frames,), jnp.float32),
        clouds=jnp.zeros((max_frames, n_points, 3), jnp.float32),
        cloud_mask=jnp.zeros((max_frames, n_points), bool),
        normals=jnp.zeros((max_frames, n_points, 3), jnp.float32),
        in_db=jnp.zeros((max_frames,), bool),
        last_frame=jnp.int32(-1),
    )


def subsample_idx(cloud: PointCloud, n_out: int) -> jnp.ndarray:
    """Strided subsample indices over the valid prefix (spatially fair);
    thin alias of the shared :func:`lidar_slam_tpu.types.strided_prefix_idx`."""
    return strided_prefix_idx(cloud.count(), n_out)


def subsample(cloud: PointCloud, n_out: int) -> PointCloud:
    """Deterministic strided subsample to the DB cloud size
    (:meth:`PointCloud.subsample`)."""
    return cloud.subsample(n_out)


def add_frame(
    db: KeyframeDB,
    cloud: PointCloud,
    frame: jnp.ndarray,
    sc_cfg: ScanContextConfig,
    enabled: jnp.ndarray | bool = True,
    normals: jnp.ndarray | None = None,
) -> KeyframeDB:
    """addFrame (loop_closure.hpp:53-59): descriptor + cloud + index.

    ``enabled=False`` consumes no slot (frame-skip path, slam_node.cpp:125-130
    returns before addFrame). ``normals``: the scan's per-point normals
    (same indexing as ``cloud``) cached for verification ICP.
    """
    enabled = jnp.asarray(enabled)
    # Descriptor from the FULL downsampled cloud (the reference computes SC on
    # the whole cloud, loop_closure.hpp:54); only the stored verification
    # cloud is capacity-subsampled.
    desc = scan_context(cloud.points, cloud.mask, sc_cfg)
    norm = jnp.sqrt(jnp.sum(desc * desc))
    n_out = db.clouds.shape[1]
    if n_out >= cloud.points.shape[0]:
        cl, nrm = cloud, normals
    else:
        idx = subsample_idx(cloud, n_out)
        cl = PointCloud(cloud.points[idx], cloud.mask[idx])
        nrm = normals[idx] if normals is not None else None
    if nrm is None:
        # standalone API: estimate here (reference k=20 semantics,
        # icp.hpp:23-67); the engine passes its cached per-scan normals
        from ..ops.normals import estimate_normals

        nrm = estimate_normals(cl.points, cl.mask, k=20)
    f = frame.astype(jnp.int32)
    # PERF (round 2): every multi-GB buffer (clouds/normals/mask) is written
    # exactly ONCE per step and UNCONDITIONALLY — a gated where-read of the
    # slot, or a second .at[f].set on the same donated buffer elsewhere in
    # the program, forces XLA to materialize a full-buffer copy (~11 ms at
    # KITTI scale). The cloud is stored for every frame anyway (the reference
    # push_backs downsampled_clouds_ BEFORE the skip guard,
    # slam_node.cpp:123-130); normals of a skipped frame are dead data since
    # ``in_db`` (gated) stays False — detect() never reads them.
    return db._replace(
        desc=db.desc.at[f].set(jnp.where(enabled, desc, db.desc[f])),
        desc_norm=db.desc_norm.at[f].set(jnp.where(enabled, norm, db.desc_norm[f])),
        clouds=db.clouds.at[f].set(cl.points),
        cloud_mask=db.cloud_mask.at[f].set(cl.mask),
        normals=db.normals.at[f].set(nrm),
        in_db=db.in_db.at[f].set(jnp.where(enabled, True, db.in_db[f])),
        last_frame=jnp.where(enabled, f, db.last_frame),
    )


class LoopDetections(NamedTuple):
    """Fixed-shape result block (mirrors LoopClosureResult, loop_closure.hpp:25-31).

    Arrays are length M = max_candidates * (1 + verify_extra_tranches),
    ascending by SC distance; at most ``max_candidates`` are accepted."""

    accepted: jnp.ndarray     # (M,) bool
    query_frame: jnp.ndarray  # () int32
    match_frame: jnp.ndarray  # (M,) int32
    transform: jnp.ndarray    # (M, 4, 4) — maps query sensor frame -> match frame
    sc_distance: jnp.ndarray  # (M,)
    icp_fitness: jnp.ndarray  # (M,)
    # instrumentation (VERDICT r4 item 3 — is the tranche bound binding?):
    coarse_fitness: jnp.ndarray  # (M,) coarse-phase plane RMS (inf when the
    #   lane's tranche never ran or verify_coarse_iterations == 0)
    n_valid: jnp.ndarray      # () int32 — candidates passing the SC gate
    #   (may exceed M: the reference's unbounded walk would see them all)
    fine_fired: jnp.ndarray   # () bool — >=1 fine verify phase ran this call


@functools.partial(jax.jit, static_argnames=("cfg", "sc_cfg", "nn1_fn"))
def detect(
    db: KeyframeDB,
    cfg: LoopClosureConfig = LoopClosureConfig(),
    sc_cfg: ScanContextConfig = ScanContextConfig(),
    expect_query=None,
    nn1_fn=None,
    query=None,
) -> LoopDetections:
    """detect() for the most recently added frame (loop_closure.hpp:66-126).

    ``expect_query``: optional traced frame index — when given and it differs
    from ``db.last_frame`` every candidate is rejected. This guards the
    skipped-frame case: a frame dropped for low point count never enters the
    DB, so a detection pass on its cadence tick would otherwise re-query the
    previous DB entry and deterministically re-find (and re-add) the same
    loops the earlier pass already accepted. The reference returns early on
    skipped frames, so detection never re-runs for an old query
    (slam_node.cpp:125-130, 159-167).

    ``query``: optional traced frame index to query INSTEAD of
    ``db.last_frame``. Lets a multi-tick program run several cadence
    queries after one block of steps: the candidate mask is one-sided
    (candidates strictly older than the query by >= frame_gap), so frames
    added AFTER the query frame can never enter its candidate set and a
    bunched query returns exactly what it would have at its own tick. A
    query frame that was skipped (never addFrame'd) rejects everything
    via ``in_db`` — the same guard ``expect_query`` provides for the
    query-the-head form.
    """
    F = db.desc.shape[0]
    K = cfg.max_candidates
    q = db.last_frame if query is None else jnp.asarray(query, jnp.int32)
    q_safe = jnp.maximum(q, 0)

    if cfg.ring_key_prefilter > 0:
        from ..ops.scan_context import sc_distances_ring_prefiltered

        dist, best_shift = sc_distances_ring_prefiltered(
            db.desc[q_safe], db.desc, db.desc_norm,
            k=min(cfg.ring_key_prefilter, F),
        )
    else:
        dist, best_shift = sc_distances(db.desc[q_safe], db.desc, db.desc_norm)

    frames = jnp.arange(F, dtype=jnp.int32)
    gap_ok = (q_safe - frames) >= cfg.frame_gap  # frame indices ARE the DB ids
    cand_ok = (
        db.in_db
        & (frames < q_safe)
        & gap_ok
        & (dist < cfg.sc_distance_threshold)
        & (q >= 0)
    )
    if query is not None:
        # explicit-query form: the query itself must have been addFrame'd
        # (skipped frames reject everything, matching expect_query below)
        cand_ok = cand_ok & db.in_db[q_safe]
    if expect_query is not None:
        cand_ok = cand_ok & (q == jnp.asarray(expect_query, jnp.int32))
    # Verify-until-accepted (loop_closure.hpp:96-123): the reference walks
    # candidates in ascending SC distance until ``max_candidates`` are
    # ACCEPTED, not merely verified. Bounded equivalent: rank the top
    # M = K * (1 + extra_tranches) candidates, verify tranche 1 (the best K),
    # and only if fewer than K were accepted AND more valid candidates exist
    # run the next tranche — then keep the first K acceptances in ascending
    # distance order (exactly the reference's walk restricted to the top M).
    NT = 1 + max(cfg.verify_extra_tranches, 0)
    M = NT * K
    masked = jnp.where(cand_ok, dist, jnp.inf)
    neg_top, cand_idx = jax.lax.top_k(-masked, M)  # M best (ascending distance)
    cand_dist = -neg_top
    cand_valid = jnp.isfinite(cand_dist)
    cand_idx = cand_idx.astype(jnp.int32)

    # Gather the candidate clouds/masks/normals FIRST: the lax.cond gates
    # below must capture only these few-MB slices — branches capturing the
    # multi-GB (F, N, 3) DB buffers crash the TPU compiler at KITTI-scale
    # shapes (and ungated verification costs ~50 ms per detection pass).
    # Unrolled dynamic_index slices, NOT fancy gather: XLA lowers a
    # dynamic-index gather from a multi-GB HBM buffer ~30x slower than M
    # dynamic-slices (measured 11.5 ms vs 0.4 ms at KITTI scale for M=6).
    def take_rows(buf, idx):
        rows = [
            jax.lax.dynamic_index_in_dim(buf, idx[k], 0, keepdims=False)
            for k in range(idx.shape[0])
        ]
        return jnp.stack(rows)

    query_cloud = PointCloud(db.clouds[q_safe], db.cloud_mask[q_safe])
    cand_clouds = take_rows(db.clouds, cand_idx)     # (M, N, 3)
    cand_masks = take_rows(db.cloud_mask, cand_idx)  # (M, N)
    cand_normals = take_rows(db.normals, cand_idx)   # (M, N, 3)

    # Coarse warm start is HOISTED out of the per-lane ICP (vc > 0): the
    # fine loop below gets coarse_iterations=0 and is seeded with the hoisted
    # coarse transform instead — bit-identical composition (the hoisted
    # phase replicates ops/icp.py:164-182 exactly, tested in
    # test_loop_closure.test_hoisted_coarse_matches_nested) that additionally
    # exposes each lane's coarse-sample plane RMS for the early-reject gate
    # and for instrumentation (LoopDetections.coarse_fitness).
    vc = cfg.verify_coarse_iterations
    do_coarse = vc > 0 and cfg.verify_coarse_sample < db.clouds.shape[1]
    icp_cfg = ICPConfig(
        max_iterations=cfg.icp_max_iterations,
        tolerance=cfg.verify_tolerance,
        sample_points=cfg.verify_sample,
        coarse_iterations=0,
        coarse_sample=cfg.verify_coarse_sample,
    )

    # Optional yaw seed from the SC best shift (reference uses identity init,
    # loop_closure.hpp:105-109).
    if cfg.yaw_seed:
        yaw = shift_to_yaw(best_shift[cand_idx], sc_cfg.num_sectors)
        zeros = jnp.zeros_like(yaw)
        w = jnp.stack([zeros, zeros, yaw], axis=-1)
        init_T = se3.from_rt(se3.exp_so3(w), jnp.zeros((M, 3)))
    else:
        init_T = jnp.broadcast_to(jnp.eye(4), (M, 4, 4))

    def verify(cloud, mask, normals, T0, skip):
        # nn1_fn: an EXACT correspondence backend (the engine passes the
        # Pallas VMEM kernel on TPU). Without it the verification ICP paid
        # the default streamed brute force — 304 ms vs 64 ms per firing
        # pass at bench shapes, identical lane results
        # (tools/profile_firing.py); pruned/windowed backends are NOT safe
        # here (loop candidates sit at arbitrary offsets).
        res = icp_point_to_plane(
            query_cloud, PointCloud(cloud, mask), normals, icp_cfg, T0,
            nn1_fn=nn1_fn, inactive=skip,
        )
        return res.transformation, res.converged, res.final_error

    # Hoisted coarse phase (see note at icp_cfg): a plain-callable backend
    # only — the engine's verify backend is the plain exact kernel; prepared/
    # fused backends stay inside icp_point_to_plane.
    nn_fn = nn1_fn if nn1_fn is not None else (lambda s, t, m: nn1(s, t, m))
    if do_coarse:
        q_disp = PointCloud(
            jnp.where(query_cloud.mask[:, None], query_cloud.points, 1.0e6),
            query_cloud.mask,
        )
        csrc = q_disp.subsample(cfg.verify_coarse_sample)
        cw = csrc.mask.astype(csrc.points.dtype)
        cdenom = jnp.maximum(jnp.sum(cw), 1.0)

        def coarse_phase(cloud, mask, normals, T0):
            """ops/icp.py:164-182's coarse warm start, bit-identical, plus
            the coarse-sample plane RMS at the resulting transform (the
            early-reject / instrumentation statistic)."""

            def match_query(cur):
                idx, _ = nn_fn(cur, cloud, mask)
                return cloud[idx], normals[idx]

            def body(i, T):
                cur = se3.apply(T, csrc.points)
                matched, nrm = match_query(cur)
                delta = solve_point_to_plane(
                    cur, matched, nrm, csrc.mask, icp_cfg.solver_damping
                )
                return se3.compose(delta, T)

            T = jax.lax.fori_loop(
                0, vc, body, jnp.asarray(T0, csrc.points.dtype)
            )
            cur = se3.apply(T, csrc.points)
            matched, nrm = match_query(cur)
            cerr = _plane_error(cur, matched, nrm, cw, cdenom)
            return T, cerr

    def skipped(k):
        return (
            jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (k, 4, 4)),
            jnp.zeros((k,), bool),
            jnp.full((k,), jnp.inf, jnp.float32),
            jnp.full((k,), jnp.inf, jnp.float32),  # coarse_fitness
            jnp.bool_(False),                      # fine_fired
        )

    reject = cfg.verify_coarse_reject if do_coarse else 0.0

    def tranche(sl, run_gate):
        """Verify candidates [sl : sl + K) iff ``run_gate`` (traced bool)."""
        cl = cand_clouds[sl : sl + K]
        mk = cand_masks[sl : sl + K]
        nr = cand_normals[sl : sl + K]
        T0 = init_T[sl : sl + K]
        valid = cand_valid[sl : sl + K]

        if not do_coarse:

            def run(_):
                tf, conv, fit = jax.vmap(verify)(cl, mk, nr, T0, ~valid)
                return (
                    tf, conv, fit,
                    jnp.full((K,), jnp.inf, jnp.float32),
                    jnp.bool_(True),
                )

            return jax.lax.cond(run_gate, run, lambda _: skipped(K),
                                operand=None)

        def run(_):
            Tc, cerr = jax.vmap(coarse_phase)(cl, mk, nr, T0)
            if reject > 0:
                hopeless = cerr > reject
            else:
                hopeless = jnp.zeros((K,), bool)
            inact = ~valid | hopeless
            fine_gate = jnp.any(~inact)

            def fine(_):
                return jax.vmap(verify)(cl, mk, nr, Tc, inact)

            def no_fine(_):
                return (
                    Tc,
                    jnp.zeros((K,), bool),
                    jnp.full((K,), jnp.inf, jnp.float32),
                )

            tf, conv, fit = jax.lax.cond(fine_gate, fine, no_fine,
                                         operand=None)
            # a coarse-rejected lane reports the verdict the reference's
            # full walk would hand a non-converging candidate
            conv = conv & ~hopeless
            fit = jnp.where(hopeless, jnp.inf, fit)
            return tf, conv, fit, cerr, fine_gate

        return jax.lax.cond(run_gate, run, lambda _: skipped(K),
                            operand=None)

    tf, conv, fit, cerr, fine_any = tranche(0, jnp.any(cand_valid[:K]))
    acc0 = cand_valid[:K] & conv & (fit < cfg.icp_fitness_threshold)
    n_acc = jnp.sum(acc0.astype(jnp.int32))
    for t in range(1, NT):
        sl = t * K
        gate = (n_acc < K) & jnp.any(cand_valid[sl : sl + K])
        tf_t, conv_t, fit_t, cerr_t, ff_t = tranche(sl, gate)
        tf = jnp.concatenate([tf, tf_t], axis=0)
        conv = jnp.concatenate([conv, conv_t], axis=0)
        fit = jnp.concatenate([fit, fit_t], axis=0)
        cerr = jnp.concatenate([cerr, cerr_t], axis=0)
        fine_any = fine_any | ff_t
        acc_t = cand_valid[sl : sl + K] & conv_t & (
            fit_t < cfg.icp_fitness_threshold
        )
        n_acc = n_acc + jnp.sum(acc_t.astype(jnp.int32))

    accepted = cand_valid & conv & (fit < cfg.icp_fitness_threshold)
    # Quota: keep only the first K acceptances in ascending-distance order
    # (the reference stops once max_candidates are accepted).
    accepted = accepted & (jnp.cumsum(accepted.astype(jnp.int32)) <= K)

    return LoopDetections(
        accepted=accepted,
        query_frame=q_safe,
        match_frame=cand_idx,
        transform=tf,
        sc_distance=cand_dist,
        icp_fitness=fit,
        coarse_fitness=cerr,
        n_valid=jnp.sum(cand_ok.astype(jnp.int32)),
        fine_fired=fine_any,
    )
