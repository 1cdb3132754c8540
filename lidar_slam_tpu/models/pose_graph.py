"""From-scratch SE(3) pose-graph Levenberg-Marquardt optimizer in JAX.

Replaces GTSAM wholesale (the reference's backend, pose_graph.cpp:6-171:
NonlinearFactorGraph + PriorFactor + BetweenFactor<Pose3> +
LevenbergMarquardtOptimizer). The factor-graph semantics are preserved:

- prior factor anchoring pose 0 (pose_graph.cpp:58-79),
- odometry BetweenFactors with diagonal sigmas scaled by
  ``1 + 10 * fitness`` (pose_graph.cpp:81-116, scale at :88),
- loop-closure BetweenFactors with tighter sigmas (pose_graph.cpp:118-141),
- LM with lambda_init=1e-5, factor 10, max 100 iterations, relative/absolute
  error tolerance 1e-5 (pose_graph.cpp:153-157 + GTSAM defaults),
- ``error`` = 0.5 * sum of squared whitened residuals (GTSAM convention).

TPU-native design: factors live in fixed-capacity arrays with validity masks
(invalid residuals are zero-weighted), residuals are batched SE(3)
log/compose ops, and the damped normal equations are solved **matrix-free**:
J and J^T J are never formed — jax.jvp / jax.vjp of the residual function
provide exact J.x / J^T.y products for a conjugate-gradient inner loop. The
whole optimize() is one jit-compiled program (lax.while_loop LM outer loop,
lax.while_loop CG inner loop), so the backend shares the XLA program with the
frontend.

Between-factor residual: r = Log(meas^-1 . (T_i^-1 . T_j)) / sigma, with
right retraction T . Exp(delta). The minimum coincides with GTSAM's.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import PoseGraphConfig
from ..ops import se3


class PoseGraphState(NamedTuple):
    """Fixed-capacity factor-graph storage (replaces gtsam::NonlinearFactorGraph).

    Odometry factor ``k`` (k >= 1) connects poses (k-1, k) — the reference
    only ever adds consecutive odometry factors (slam_node.cpp:145). A frame
    skipped for low point count has ``odom_valid[k] = False`` (matching the
    reference's missing-factor gap, slam_node.cpp:125-130); LM damping keeps
    the system determined.
    """

    poses: jnp.ndarray        # (F, 4, 4) current estimates
    n_poses: jnp.ndarray      # () int32
    odom_rel: jnp.ndarray     # (F, 4, 4) measured relative transform (k-1 -> k)
    odom_valid: jnp.ndarray   # (F,) bool
    odom_scale: jnp.ndarray   # (F,) f32 noise scale = 1 + 10 * fitness
    loop_from: jnp.ndarray    # (L,) int32
    loop_to: jnp.ndarray      # (L,) int32
    loop_rel: jnp.ndarray     # (L, 4, 4)
    loop_valid: jnp.ndarray   # (L,) bool
    n_loops: jnp.ndarray      # () int32
    n_loops_dropped: jnp.ndarray  # () int32 — accepted loops lost to capacity


def init_state(max_frames: int, max_loops: int) -> PoseGraphState:
    # NOTE: each leaf gets its OWN buffer (tile, not broadcast_to) — the
    # pipeline donates the state pytree, and XLA rejects donating one buffer
    # aliased into two arguments.
    def eyes(n):
        return jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (n, 1, 1))

    return PoseGraphState(
        poses=eyes(max_frames),
        n_poses=jnp.int32(1),  # pose 0 = identity + prior (slam_node.cpp:64-66)
        odom_rel=eyes(max_frames),
        odom_valid=jnp.zeros((max_frames,), bool),
        odom_scale=jnp.ones((max_frames,), jnp.float32),
        loop_from=jnp.zeros((max_loops,), jnp.int32),
        loop_to=jnp.zeros((max_loops,), jnp.int32),
        loop_rel=eyes(max_loops),
        loop_valid=jnp.zeros((max_loops,), bool),
        n_loops=jnp.int32(0),
        n_loops_dropped=jnp.int32(0),
    )


def add_odometry(
    state: PoseGraphState,
    to_idx: jnp.ndarray,
    rel: jnp.ndarray,
    fitness: jnp.ndarray,
    valid: jnp.ndarray | bool = True,
) -> PoseGraphState:
    """Append odometry factor (to_idx-1 -> to_idx); mirrors pose_graph.cpp:81-116.

    The new pose estimate is chained from the previous one
    (pose_graph.cpp:107-113); noise scale = 1 + 10 * fitness (:88).
    """
    prev = state.poses[to_idx - 1]
    new_pose = se3.compose(prev, rel)
    valid = jnp.asarray(valid)
    return state._replace(
        poses=state.poses.at[to_idx].set(new_pose),
        n_poses=jnp.maximum(state.n_poses, to_idx.astype(jnp.int32) + 1),
        odom_rel=state.odom_rel.at[to_idx].set(rel),
        odom_valid=state.odom_valid.at[to_idx].set(valid),
        odom_scale=state.odom_scale.at[to_idx].set(1.0 + fitness * 10.0),
    )


def add_loop(
    state: PoseGraphState,
    from_idx: jnp.ndarray,
    to_idx: jnp.ndarray,
    rel: jnp.ndarray,
    valid: jnp.ndarray | bool = True,
) -> PoseGraphState:
    """Append a loop-closure BetweenFactor (pose_graph.cpp:118-141).

    With ``valid=False`` the slot is consumed but zero-weighted — this keeps
    the jit program static when a detection is rejected at runtime. Accepted
    loops beyond capacity are dropped and counted in ``n_loops_dropped``
    (surfaced by SlamEngine.metrics) instead of silently vanishing.
    """
    i = state.n_loops
    valid = jnp.asarray(valid)
    cap = state.loop_valid.shape[0]
    slot = jnp.minimum(i, cap - 1)  # saturate: beyond-capacity writes last slot
    ok = valid & (i < cap)
    dropped = valid & (i >= cap)
    return state._replace(
        n_loops_dropped=state.n_loops_dropped + dropped.astype(jnp.int32),
        loop_from=state.loop_from.at[slot].set(
            jnp.where(ok, from_idx.astype(jnp.int32), state.loop_from[slot])
        ),
        loop_to=state.loop_to.at[slot].set(
            jnp.where(ok, to_idx.astype(jnp.int32), state.loop_to[slot])
        ),
        loop_rel=state.loop_rel.at[slot].set(
            jnp.where(ok, rel, state.loop_rel[slot])
        ),
        loop_valid=state.loop_valid.at[slot].set(
            jnp.where(ok, True, state.loop_valid[slot])
        ),
        n_loops=i + jnp.where(ok, 1, 0),
    )


def window_loops(state: PoseGraphState, window: int) -> PoseGraphState:
    """View of ``state`` restricted to the NEWEST ``window`` loop factors.

    Static shapes pin the Woodbury solve's K-Cholesky to
    (6*capacity)^2 per LM iteration regardless of how many loops were
    actually accepted; the in-graph optimize-on-find chunk
    (slam_node.cpp:112-115 semantics) uses this view to pay (6*window)^2
    instead, while finalize keeps optimizing over every factor. Slots are
    filled in acceptance order, so ``dynamic_slice`` at
    ``clamp(n_loops - window)`` keeps the most recent loops — the ones
    correcting CURRENT drift. Exact while ``n_loops <= window``; past that
    the oldest loops are ignored by the inline step only.

    Returns a read-only view for :func:`optimize` — do not ``add_loop``
    into it (slot indexing assumes the full capacity array).
    """
    cap = state.loop_valid.shape[0]
    if window <= 0 or window >= cap:
        return state
    start = jnp.clip(state.n_loops - window, 0, cap - window)

    def sl(a):
        return jax.lax.dynamic_slice_in_dim(a, start, window, axis=0)

    return state._replace(
        loop_from=sl(state.loop_from),
        loop_to=sl(state.loop_to),
        loop_rel=sl(state.loop_rel),
        loop_valid=sl(state.loop_valid),
        n_loops=jnp.minimum(state.n_loops, window),
    )


# TPU matmul units ingest bf16 by default; every contraction in the Woodbury
# algebra must run at true f32 (HIGHEST) — K entries reach ~1e10 from squared
# whitened lever arms, far beyond bf16's 8-bit mantissa. se3.py pins its own
# matmuls the same way.
_PREC = jax.lax.Precision.HIGHEST


def _between_residual(Ti, Tj, meas_inv):
    """Whitened-later residual Log(meas^-1 (Ti^-1 Tj)) for batched factors."""
    rel = se3.compose(se3.inverse(Ti), Tj)
    return se3.log(se3.compose(meas_inv, rel))


def _whiten(cfg: PoseGraphConfig):
    def sig(rot_s, trans_s):
        return jnp.concatenate(
            [jnp.full((3,), rot_s, jnp.float32), jnp.full((3,), trans_s, jnp.float32)]
        )

    return (
        sig(cfg.prior_rotation_sigma, cfg.prior_translation_sigma),
        sig(cfg.odom_rotation_sigma, cfg.odom_translation_sigma),
        sig(cfg.loop_rotation_sigma, cfg.loop_translation_sigma),
    )


def _residuals(state: PoseGraphState, deltas: jnp.ndarray, cfg: PoseGraphConfig):
    """All whitened residuals, (1 + F + L, 6), zero for invalid factors.

    ``deltas`` (F, 6) are right-retraction tangents at the current poses.
    """
    F = state.poses.shape[0]
    poses = se3.compose(state.poses, se3.exp(deltas))
    prior_sig, odom_sig, loop_sig = _whiten(cfg)

    # Prior on pose 0 at identity (slam_node.cpp:66).
    r_prior = (se3.log(poses[0]) / prior_sig)[None, :]

    # Odometry chain: factor k connects (k-1, k), k in [1, n_poses).
    Ti = poses[:-1]
    Tj = poses[1:]
    meas_inv = se3.inverse(state.odom_rel[1:])
    r_odom = _between_residual(Ti, Tj, meas_inv)  # (F-1, 6)
    k = jnp.arange(1, F)
    odom_w = (state.odom_valid[1:] & (k < state.n_poses)).astype(jnp.float32)
    scale = jnp.maximum(state.odom_scale[1:], 1e-12)
    r_odom = r_odom * odom_w[:, None] / (odom_sig[None, :] * scale[:, None])

    # Loop closures.
    Tf = poses[state.loop_from]
    Tt = poses[state.loop_to]
    r_loop = _between_residual(Tf, Tt, se3.inverse(state.loop_rel))
    loop_w = state.loop_valid.astype(jnp.float32)
    r_loop = r_loop * loop_w[:, None] / loop_sig[None, :]

    return jnp.concatenate([r_prior, r_odom, r_loop], axis=0)


def _poses_from_rel_deltas(state: PoseGraphState, d: jnp.ndarray) -> jnp.ndarray:
    """Corrected poses under the RELATIVE parameterization.

    P_0 = T_0 Exp(d_0); P_k = P_{k-1} (R_k Exp(d_k)) where
    R_k = T_{k-1}^{-1} T_k are the current estimated relative transforms.
    The prefix products are one ``lax.associative_scan`` of SE(3) composition
    — log-depth batched 4x4 matmuls, the TPU-native replacement for the
    sequential pose chaining a CPU solver would do.
    """
    T = state.poses
    rels = se3.compose(se3.inverse(T[:-1]), T[1:])          # (F-1, 4, 4)
    M0 = se3.compose(T[0], se3.exp(d[0]))[None]
    Mk = se3.compose(rels, se3.exp(d[1:]))
    M = jnp.concatenate([M0, Mk], axis=0)
    return jax.lax.associative_scan(se3.compose, M)


def _residuals_rel(state: PoseGraphState, d: jnp.ndarray, cfg: PoseGraphConfig):
    """Whitened residuals under the relative parameterization (same factors
    and weights as :func:`_residuals`; identical values at ``d = 0``).

    Odometry rows shortcut the scan: inv(P_{k-1}) P_k == R_k Exp(d_k), so
    only the prior and loop rows differentiate through the prefix products.
    """
    F = state.poses.shape[0]
    T = state.poses
    prior_sig, odom_sig, loop_sig = _whiten(cfg)

    P = _poses_from_rel_deltas(state, d)

    r_prior = (se3.log(P[0]) / prior_sig)[None, :]

    rels = se3.compose(se3.inverse(T[:-1]), T[1:])
    rel_new = se3.compose(rels, se3.exp(d[1:]))             # (F-1, 4, 4)
    meas_inv = se3.inverse(state.odom_rel[1:])
    r_odom = se3.log(se3.compose(meas_inv, rel_new))
    k = jnp.arange(1, F)
    odom_w = (state.odom_valid[1:] & (k < state.n_poses)).astype(jnp.float32)
    scale = jnp.maximum(state.odom_scale[1:], 1e-12)
    r_odom = r_odom * odom_w[:, None] / (odom_sig[None, :] * scale[:, None])

    Tf = P[state.loop_from]
    Tt = P[state.loop_to]
    r_loop = _between_residual(Tf, Tt, se3.inverse(state.loop_rel))
    loop_w = state.loop_valid.astype(jnp.float32)
    r_loop = r_loop * loop_w[:, None] / loop_sig[None, :]

    return jnp.concatenate([r_prior, r_odom, r_loop], axis=0)


# -- DD-translation pose chain (support for the emulated-f64 backend) --------
#
# At KITTI extents the f32 ABSOLUTE pose chain is the accuracy floor of the
# whole backend: positions reach ~750 m (ulp ~ 6e-5 m), and the loop-closure
# residual Log(meas^-1 inv(P_i) P_j) cancels two such positions, so its
# translation rows carry ~1e-3 m of prefix-scan rounding — whitened by the
# 0.025 m loop sigma that is ~0.04 per entry, and through the ~1.5e5 whitened
# lever arms it contaminates the gradient enough that LM stalls at cost ~250
# where f64 reaches ~4 (measured, 4,500 poses). Fix: carry the chain
# TRANSLATION as a DD pair through the associative scan. Rotations stay f32
# (O(1) entries; their ~1e-6 rad scan error is far inside the 0.01 rad
# sigma). Odometry rows never touch absolute poses (they are local), and the
# relative transforms are extracted from the stored f32 poses EXACTLY
# (two_sum of exactly-representable values), so nothing else needs widening.


def _rot_apply_dd(R, t):
    """Apply (..., 3, 3) f32 rotations to DD 3-vectors with DD accumulation."""
    from ..ops import df64
    from ..ops.df64 import DD

    prod = df64.mul_f(DD(t.hi[..., None, :], t.lo[..., None, :]), R)
    return df64.dsum(prod, axis=-1)


def _matmul3_dd(A, B):
    """(..., 3, 3) @ (..., 3, 3) fully in DD."""
    from ..ops import df64
    from ..ops.df64 import DD

    # [i, k, j] = A[i, k] * B[k, j], summed over k (axis -2)
    prod = df64.mul(DD(A.hi[..., :, :, None], A.lo[..., :, :, None]),
                    DD(B.hi[..., None, :, :], B.lo[..., None, :, :]))
    return df64.dsum(prod, axis=-2)


def _rot_apply_dddd(R, t):
    """DD (..., 3, 3) rotation applied to a DD 3-vector."""
    from ..ops import df64
    from ..ops.df64 import DD

    prod = df64.mul(DD(R.hi, R.lo),
                    DD(t.hi[..., None, :], t.lo[..., None, :]))
    return df64.dsum(prod, axis=-1)


def _inv3_dd(R):
    """TRUE inverse of near-orthogonal f32 (..., 3, 3) rotations, in DD.

    The transpose is NOT good enough for the chain extraction: stored f32
    rotations are only ~1e-7 orthogonal, and the extract-recompose round
    trip telescopes R_k R_k^T = I + delta_k across all F steps — measured
    4.5e-4 rad of rotation drift and 0.15 m of position error at 4,500
    poses (the host f64 path telescopes exactly because np.linalg.inv is a
    true inverse). One Newton step off the transpose,
    inv(R) = R^T (2I - R R^T) + O(delta^2), leaves delta^2 ~ 1e-14 — at the
    DD noise floor."""
    from ..ops import df64

    Rdd = df64.dd(R)
    RT = df64.dd(jnp.swapaxes(R, -1, -2))
    S = _matmul3_dd(Rdd, RT)                          # I + delta
    eye2 = 2.0 * jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), S.hi.shape)
    C = df64.sub(df64.dd(eye2), S)                    # 2I - (I + delta)
    return _matmul3_dd(RT, C)


def _compose_rt_dd(a, b):
    """SE(3) composition on (R DD, t DD) pairs: (Ra Rb, ta + Ra tb).

    Rotations are carried in DD too: an f32 rotation scan drifts ~1e-6 rad
    over 4,500 log-depth products, and 750 m lever arms turn that into
    ~0.1 m position error — whitened O(1) loop-row noise that alone stalls
    the LM at cost ~250 (measured; f64 reaches 4.1)."""
    from ..ops import df64

    Ra, ta = a
    Rb, tb = b
    return (_matmul3_dd(Ra, Rb), df64.add(ta, _rot_apply_dddd(Ra, tb)))


def _chain_dd(state: PoseGraphState, d: jnp.ndarray):
    """Relative-parameterization pose chain with the prefix products
    accumulated fully in DD (double-single) precision.

    Same semantics as :func:`_poses_from_rel_deltas` (P_0 = T_0 Exp(d_0),
    P_k = P_{k-1} R_k Exp(d_k)). The relative inputs are each ONE product
    of exactly-stored f32 values (error ~eps32 absolute, the measurement
    floor); the DD scan preserves them instead of compounding rounding.

    Returns ``(PR, Pt)``: chain rotations (F, 3, 3) f32 and chain
    translations DD (F, 3).
    """
    from ..ops import df64
    from ..ops.df64 import DD

    T = state.poses
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    # Exact relative extraction: the f32 stored positions are exact values,
    # so their DD difference is exact; the rotation must be inverted with a
    # TRUE inverse (see _inv3_dd) or the recomposition drifts.
    dt = df64.sub(df64.dd(t[1:]), df64.dd(t[:-1]))
    Rinv = _inv3_dd(R[:-1])                           # (F-1, 3, 3) DD
    rel_t = _rot_apply_dddd(Rinv, dt)                 # (F-1, 3) DD
    rel_R = _matmul3_dd(Rinv, df64.dd(R[1:]))         # R_{k-1}^-1 R_k in DD

    E = se3.exp(d)                                    # (F, 4, 4)
    Re = df64.dd(E[..., :3, :3])
    te = df64.dd(E[..., :3, 3])
    R0 = df64.dd(R[0][None])
    M0R = _matmul3_dd(R0, DD(Re.hi[:1], Re.lo[:1]))
    M0t = df64.add(df64.dd(t[0][None]),
                   _rot_apply_dddd(R0, DD(te.hi[:1], te.lo[:1])))
    MkR = _matmul3_dd(rel_R, DD(Re.hi[1:], Re.lo[1:]))
    Mkt = df64.add(rel_t, _rot_apply_dddd(rel_R, DD(te.hi[1:], te.lo[1:])))

    MR = DD(jnp.concatenate([M0R.hi, MkR.hi], axis=0),
            jnp.concatenate([M0R.lo, MkR.lo], axis=0))
    Mt = DD(jnp.concatenate([M0t.hi, Mkt.hi], axis=0),
            jnp.concatenate([M0t.lo, Mkt.lo], axis=0))
    PR, Pt = jax.lax.associative_scan(_compose_rt_dd, (MR, Mt))
    return df64.to_f32(PR), Pt


def _residuals_dd0(state: PoseGraphState, cfg: PoseGraphConfig) -> jnp.ndarray:
    """Whitened residuals of the STORED poses (zero delta) with every 750 m
    cancellation done in DD — identical factor model to
    :func:`_residuals_rel` at ``d = 0``.

    Critically, this does NOT rebuild the chain through a prefix scan: at
    zero delta all factors are functions of stored-pose DIFFERENCES, and the
    stored f32 values are exact, so ``two_sum`` subtraction gives the exact
    relative translations. (A scan rebuild — even with DD translations —
    injects f32 ROTATION noise ~1e-6 rad that 750 m lever arms turn into
    ~0.1 m loop-row errors, whitened O(1); measured: those errors alone
    stall the LM at cost ~260 where f64 reaches 4.1.) Residual VALUES are
    O(sigma)-small, so the f32 output loses nothing."""
    from ..ops import df64
    from ..ops.df64 import DD

    F = state.poses.shape[0]
    prior_sig, odom_sig, loop_sig = _whiten(cfg)
    T = state.poses
    R = T[..., :3, :3]
    t = T[..., :3, 3]

    r_prior = (se3.log(T[0]) / prior_sig)[None, :]    # near origin: f32 exact

    # odometry rows: rel_k = T_{k-1}^-1 T_k with the translation difference
    # in DD (exact for exactly-stored f32 positions)
    dt = df64.sub(df64.dd(t[1:]), df64.dd(t[:-1]))
    RT = jnp.swapaxes(R[:-1], -1, -2)
    rel_t = _rot_apply_dd(RT, dt)
    rel_R = jnp.einsum("...ji,...jk->...ik", R[:-1], R[1:], precision=_PREC)
    rel4 = se3.from_rt(rel_R, df64.to_f32(rel_t))     # O(1 m): f32 ok
    meas_inv = se3.inverse(state.odom_rel[1:])
    r_odom = se3.log(se3.compose(meas_inv, rel4))
    k = jnp.arange(1, F)
    odom_w = (state.odom_valid[1:] & (k < state.n_poses)).astype(jnp.float32)
    scale = jnp.maximum(state.odom_scale[1:], 1e-12)
    r_odom = r_odom * odom_w[:, None] / (odom_sig[None, :] * scale[:, None])

    # loop rows: inv(T_i) T_j with the 750 m cancellation done in DD
    lf, lt = state.loop_from, state.loop_to
    Ri, Rj = R[lf], R[lt]
    dtl = df64.sub(DD(t[lt], jnp.zeros_like(t[lt])),
                   DD(t[lf], jnp.zeros_like(t[lf])))
    rel_tl = _rot_apply_dd(jnp.swapaxes(Ri, -1, -2), dtl)
    rel_Rl = jnp.einsum("...ji,...jk->...ik", Ri, Rj, precision=_PREC)
    rel_ij = se3.from_rt(rel_Rl, df64.to_f32(rel_tl))
    r_loop = se3.log(se3.compose(se3.inverse(state.loop_rel), rel_ij))
    loop_w = state.loop_valid.astype(jnp.float32)
    r_loop = r_loop * loop_w[:, None] / loop_sig[None, :]

    return jnp.concatenate([r_prior, r_odom, r_loop], axis=0)


def graph_error(state: PoseGraphState, cfg: PoseGraphConfig) -> jnp.ndarray:
    """GTSAM-convention error: 0.5 * sum of squared whitened residuals."""
    F = state.poses.shape[0]
    r = _residuals(state, jnp.zeros((F, 6), jnp.float32), cfg)
    return 0.5 * jnp.sum(r * r)


def _cg_solve(matvec, b, iters: int, tol: float):
    """Conjugate gradient on the damped normal equations (matrix-free).

    ``tol`` is relative to |b|^2 — whitened residual magnitudes vary by
    orders of magnitude across graph sizes, so an absolute threshold either
    never fires or fires immediately."""
    x0 = jnp.zeros_like(b)
    r0 = b  # b - A@0
    p0 = r0
    rs0 = jnp.vdot(r0, r0)
    tol = tol * jnp.maximum(rs0, 1e-30)

    def cond(c):
        i, _, _, _, rs = c
        return jnp.logical_and(i < iters, rs > tol)

    def body(c):
        i, x, r, p, rs = c
        Ap = matvec(p)
        alpha = rs / jnp.maximum(jnp.vdot(p, Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.vdot(r, r)
        p = r + (rs_new / jnp.maximum(rs, 1e-30)) * p
        return (i + 1, x, r, p, rs_new)

    _, x, _, _, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), x0, r0, p0, rs0))
    return x


def _woodbury_solve(state: PoseGraphState, cfg: PoseGraphConfig, lam, r0):
    """EXACT damped Gauss-Newton step under the relative parameterization —
    the TPU-native replacement for GTSAM's direct sparse solve
    (pose_graph.cpp:147-160).

    In relative coordinates the hand-linearized whitened Jacobian is
    block-structured:
      prior row:  d_0 / sig_p                      (diagonal block 0)
      odom row k: (w_k / (sig_o s_k)) * d_k        (diagonal blocks 1..F-1)
      loop row l: sgn_l W_l H_l (U_hi - U_lo),     U_m = sum_{m'<=m} G_m' d_m'
        with G_m = Ad(T_m), H_l = Ad(T_to)^-1, W_l = diag(w_l / sig_l)
    (first-order, Log-Jacobian ~ I — the standard pose-graph linearization;
    LM accepts/rejects on the TRUE cost so the approximation only shapes the
    step, not the optimum). So J^T J + lam I = D + B B^T with DIAGONAL D
    (6F) and B of rank 6L — Woodbury gives the exact solve with one cumsum
    over frames, O(L^2) 6x6 block assembly, and one 6Lx6L Cholesky, instead
    of CG whose matvecs differentiate through the pose-chain scan (measured
    at 4,500 poses: 142 s and stalled at 100 LM iterations vs milliseconds
    and exact steps here).

    Returns delta (F, 6) solving (J^T J + lam I) delta = -J^T r0.
    """
    F = state.poses.shape[0]
    L = state.loop_from.shape[0]
    T = state.poses
    prior_sig, odom_sig, loop_sig = _whiten(cfg)

    k = jnp.arange(1, F)
    odom_w = (state.odom_valid[1:] & (k < state.n_poses)).astype(jnp.float32)
    scale = jnp.maximum(state.odom_scale[1:], 1e-12)
    w_odom = odom_w[:, None] / (odom_sig[None, :] * scale[:, None])  # (F-1, 6)
    w_prior = 1.0 / prior_sig                                        # (6,)
    loop_w = state.loop_valid.astype(jnp.float32)
    w_loop = loop_w[:, None] / loop_sig[None, :]                     # (L, 6)

    # Diagonal D + lam (6F as (F, 6)).
    D = jnp.concatenate([(w_prior**2)[None, :], w_odom**2], axis=0) + lam
    Dinv = 1.0 / D

    G = se3.adjoint(T)                            # (F, 6, 6)
    Gt = jnp.swapaxes(G, -1, -2)
    H = se3.adjoint(se3.inverse(T[state.loop_to]))  # (L, 6, 6)

    lo = jnp.minimum(state.loop_from, state.loop_to)
    hi = jnp.maximum(state.loop_from, state.loop_to)
    sgn = jnp.where(state.loop_to >= state.loop_from, 1.0, -1.0)
    # (invalid loops are zeroed through w_loop; their K blocks become
    # identity via the +I term and their alpha solves to 0)

    # X_l = sgn_l W_l H_l  (the per-loop row transform)
    X = sgn[:, None, None] * w_loop[:, :, None] * H  # (L, 6, 6)

    # r0 rows: [prior | odom | loop]
    r_prior, r_odom, r_loop = r0[0], r0[1:F], r0[F:]

    def BT(z):
        """(B^T z)_l = E_l z for z (F, 6): sgn W H (V_hi - V_lo)."""
        V = jnp.cumsum(jnp.einsum("fij,fj->fi", G, z, precision=_PREC), axis=0)  # (F, 6)
        return jnp.einsum("lij,lj->li", X, V[hi] - V[lo], precision=_PREC)       # (L, 6)

    def B(y):
        """sum_l E_l^T y_l for y (L, 6): difference-array + cumsum."""
        c = jnp.einsum("lji,lj->li", X, y, precision=_PREC)  # X^T y per loop (L, 6)
        diff = jnp.zeros((F + 1, 6), r0.dtype)
        diff = diff.at[lo + 1].add(c)
        diff = diff.at[hi + 1].add(-c)
        A = jnp.cumsum(diff[:F], axis=0)    # (F, 6) active-range sums
        return jnp.einsum("fji,fj->fi", G, A, precision=_PREC)  # G^T A per frame

    # g = J^T r0
    g_diag = jnp.concatenate(
        [(w_prior * r_prior)[None, :], w_odom * r_odom], axis=0
    )
    g = g_diag + B(r_loop)

    # K = I + B^T D^-1 B via prefix sums of G D^-1 G^T.
    GDG = jnp.einsum("fij,fj,fkj->fik", G, Dinv, G, precision=_PREC)     # (F, 6, 6)
    S = jnp.cumsum(GDG, axis=0)                          # (F, 6, 6) prefix
    a = jnp.maximum(lo[:, None], lo[None, :])            # (L, L)
    b = jnp.minimum(hi[:, None], hi[None, :])
    Sb = S[b]                                            # (L, L, 6, 6)
    Sa = S[a]
    M = jnp.where((b > a)[..., None, None], Sb - Sa, 0.0)
    Kb = jnp.einsum("lab,lmbc,mdc->lamd", X, M, X, precision=_PREC)       # (L, 6, L, 6)
    K = Kb.reshape(L * 6, L * 6) + jnp.eye(L * 6, dtype=r0.dtype)

    rhs = -g
    y1 = Dinv * rhs
    bt = BT(y1).reshape(L * 6)
    cf = jax.scipy.linalg.cho_factor(K)
    alpha = jax.scipy.linalg.cho_solve(cf, bt).reshape(L, 6)
    return y1 - Dinv * B(alpha)


def _dd_prep(state: PoseGraphState, lam, cfg: PoseGraphConfig):
    """f32 system inputs of the emulated-f64 Woodbury step + current cost.

    MUST be its own XLA program whose outputs are materialized and then
    fed to :func:`_dd_core` as PARAMETERS. Inside one fused program XLA
    can rematerialize shared subexpressions per consumer with
    eps32-different rounding — measured at 4,500 poses: the K assembly and
    the B/B^T applications saw eps32-DIFFERENT copies of G/X, the Woodbury
    substitution identity broke, and the step came out 4.7e5x wrong;
    ``optimization_barrier`` did NOT reliably pin one realization
    (jax 0.9 / XLA:CPU), and per-jit ``compiler_options`` corrupt the
    dispatch cache once two such programs coexist. Materializing at a jit
    boundary is the only contract XLA cannot optimize away: parameters are
    buffers.
    """
    F = state.poses.shape[0]
    prior_sig, odom_sig, loop_sig = _whiten(cfg)
    k = jnp.arange(1, F)
    odom_w = (state.odom_valid[1:] & (k < state.n_poses)).astype(jnp.float32)
    scale = jnp.maximum(state.odom_scale[1:], 1e-12)
    w_odom = odom_w[:, None] / (odom_sig[None, :] * scale[:, None])
    w_prior = 1.0 / prior_sig
    loop_w = state.loop_valid.astype(jnp.float32)
    w_loop = loop_w[:, None] / loop_sig[None, :]
    D = jnp.concatenate([(w_prior**2)[None, :], w_odom**2], axis=0) + lam
    Dinv = 1.0 / D
    G = se3.adjoint(state.poses)                     # (F, 6, 6) f32
    H = se3.adjoint(se3.inverse(state.poses[state.loop_to]))
    lo = jnp.minimum(state.loop_from, state.loop_to)
    hi = jnp.maximum(state.loop_from, state.loop_to)
    sgn = jnp.where(state.loop_to >= state.loop_from, 1.0, -1.0)
    X = sgn[:, None, None] * w_loop[:, :, None] * H  # (L, 6, 6) f32
    # loop-l active frame range as a mask (scatter-free: DD scatter-adds
    # would round away the compensation terms)
    f_idx = jnp.arange(F)
    segf = (((lo[None, :] + 1) <= f_idx[:, None])
            & (f_idx[:, None] <= hi[None, :])).astype(jnp.float32)
    r0 = _residuals_dd0(state, cfg)
    cost = 0.5 * jnp.sum(r0 * r0)
    g_diag = jnp.concatenate(
        [(w_prior * r0[0])[None, :], w_odom * r0[1:F]], axis=0
    )
    return r0, cost, g_diag, G, X, Dinv, segf, lo, hi


def _dd_BT(z, G, X, lo, hi):
    """(L, 6) <- X (V_hi - V_lo), V = prefix sums of G z, all DD."""
    from ..ops import df64
    from ..ops.df64 import DD

    Gz = df64.dsum(df64.mul_f(DD(z.hi[:, None, :], z.lo[:, None, :]), G),
                   axis=2)                           # (F, 6)
    V = df64.cumsum(Gz, axis=0)
    dV = df64.sub(DD(V.hi[hi], V.lo[hi]), DD(V.hi[lo], V.lo[lo]))
    return df64.dsum(
        df64.mul_f(DD(dV.hi[:, None, :], dV.lo[:, None, :]), X), axis=2
    )


def _dd_B(y, X, segf, G):
    """(F, 6) <- sum_l over active ranges, DD; A via masked contraction
    (scatter-free: DD scatter-adds would round away the compensations)."""
    from ..ops import df64
    from ..ops.df64 import DD

    c = df64.dsum(
        df64.mul_f(DD(y.hi[:, :, None], y.lo[:, :, None]), X), axis=1
    )                                                # (L, 6) X^T y
    A = df64.dsum(
        df64.mul_f(DD(c.hi[None, :, :], c.lo[None, :, :]),
                   segf[:, :, None]),
        axis=1,
    )                                                # (F, 6) active-range sums
    return df64.dsum(
        df64.mul_f(DD(A.hi[:, None, :], A.lo[:, None, :]),
                   jnp.swapaxes(G, -1, -2)), axis=2
    )


def _dd_system(cfg: PoseGraphConfig, r0, g_diag, G, X, Dinv, segf, lo, hi):
    """Assemble the Woodbury system in DD: K = I + B^T D^-1 B (via adjoint
    prefix sums), y1 = -D^-1 g, bt = B^T y1. See _dd_core for the numerics
    rationale. Returns (Kdd, btv, y1)."""
    from ..ops import df64
    from ..ops.df64 import DD

    F = G.shape[0]
    L = X.shape[0]
    r_loop = r0[F:]
    g = df64.add(df64.dd(g_diag), _dd_B(df64.dd(r_loop), X, segf, G))

    GD = df64.mul_f(df64.dd(G), Dinv[:, None, :])    # G * Dinv (cols j)
    GDG = df64.dsum(
        df64.mul_f(DD(GD.hi[:, :, None, :], GD.lo[:, :, None, :]),
                   G[:, None, :, :]), axis=3
    )                                                # (F, 6, 6)
    S = df64.cumsum(GDG, axis=0)
    a_i = jnp.maximum(lo[:, None], lo[None, :])
    b_i = jnp.minimum(hi[:, None], hi[None, :])
    Mdd = df64.sub(DD(S.hi[b_i], S.lo[b_i]), DD(S.hi[a_i], S.lo[a_i]))
    valid_pair = (b_i > a_i)[..., None, None]
    Mdd = DD(jnp.where(valid_pair, Mdd.hi, 0.0),
             jnp.where(valid_pair, Mdd.lo, 0.0))     # (L, L, 6, 6)
    tmp = df64.dsum(
        df64.mul_f(DD(Mdd.hi[:, :, None, :, :], Mdd.lo[:, :, None, :, :]),
                   X[:, None, :, :, None]), axis=3
    )                                                # (L, L, 6, 6)
    Kdd = df64.dsum(
        df64.mul_f(DD(tmp.hi[:, :, :, None, :], tmp.lo[:, :, :, None, :]),
                   X[None, :, None, :, :]), axis=4
    )                                                # (L, M, 6a, 6d)
    Kdd = DD(jnp.transpose(Kdd.hi, (0, 2, 1, 3)).reshape(L * 6, L * 6),
             jnp.transpose(Kdd.lo, (0, 2, 1, 3)).reshape(L * 6, L * 6))
    eye = jnp.eye(L * 6, dtype=jnp.float32)
    Kdd = df64.add(Kdd, df64.dd(eye))

    y1 = df64.mul_f(df64.neg(g), Dinv)
    bt = _dd_BT(y1, G, X, lo, hi)
    btv = DD(bt.hi.reshape(L * 6), bt.lo.reshape(L * 6))
    return Kdd, btv, y1


def _dd_core(cfg: PoseGraphConfig, r0, g_diag, G, X, Dinv, segf, lo, hi):
    """The DIRECT-tier Woodbury step: system assembly + backward-stable DD
    Cholesky solve + back-substitution, one program. Every array input is a
    materialized parameter from :func:`_dd_prep` (realization-split safety;
    see its docstring).

    Why DD: K = I + B^T D^-1 B has entries ~1e10 (squared whitened lever
    arms, |t| ~ 750 m / 5 mrad) with O(1) smallest eigenvalues, so it needs
    ~1e-11 RELATIVE precision to stay positive definite; f32 assembly error
    makes K32 indefinite and every Cholesky step NaN — measured: the f32 LM
    accepts ZERO steps at 4,500 poses while this path converges to 1.0003x
    the f64 host cost (tests/test_pose_graph.py::
    test_dd_solver_matches_host_f64). TPU has no f64 ALU (the plugin
    demotes f64 to f32 silently), so extended precision is emulated with
    f32 pairs (ops/df64.py).

    The 6Lx6L solve must deliver ~DD-accurate alpha: kappa(K) ~ 1e9 and the
    back-substitution d = y1 - D^-1 B alpha cancels ~9 orders, so alpha
    error propagates straight into the step. The RHS is deliberately NOT
    pre-normalized: |bt| ~ 1e14 stays far inside f32 range through the
    substitutions (largest intermediates are Veltkamp splits at
    4097*|bt| ~ 1e18 << 3.4e38), and a scale/unscale round-trip is a trap —
    jnp.exp2 is a polynomial APPROXIMATION whose f32 result at integer
    arguments can be one ulp off a true power of two (measured:
    exp2(48) = 2^48*(1+1.2e-7)), so "exact" exp2 scaling silently perturbs
    alpha by ~eps32 relative — exactly the level that destroys the step
    (measured: cost-after 1.19e7 -> 9.87e10 at 4,500 poses from this
    alone).
    """
    from ..ops import df64
    from ..ops.df64 import DD

    L = X.shape[0]
    Kdd, btv, y1 = _dd_system(cfg, r0, g_diag, G, X, Dinv, segf, lo, hi)
    Lfac = df64.cholesky(Kdd)
    alpha = df64.solve_cholesky(Lfac, btv)
    alpha = DD(alpha.hi.reshape(L, 6), alpha.lo.reshape(L, 6))
    d = df64.sub(y1, df64.mul_f(_dd_B(alpha, X, segf, G), Dinv))
    return df64.to_f32(d)


def _dd_fin(cfg: PoseGraphConfig, y1, alpha, G, X, Dinv, segf):
    """PCG-tier back-substitution d = y1 - D^-1 B alpha from a materialized
    alpha (solved host-side by df64.solve_pcg_staged)."""
    from ..ops import df64
    from ..ops.df64 import DD

    L = X.shape[0]
    alpha = DD(alpha.hi.reshape(L, 6), alpha.lo.reshape(L, 6))
    d = df64.sub(y1, df64.mul_f(_dd_B(alpha, X, segf, G), Dinv))
    return df64.to_f32(d)


def _dd_apply(state: PoseGraphState, d, cfg: PoseGraphConfig):
    """Retract the solved delta through the DD pose chain; returns the
    materialized new poses (a separate program: the trial cost is then
    evaluated on the STORED poses by :func:`_dd_cost`)."""
    from ..ops import df64

    PR, Pt = _chain_dd(state, d)
    return se3.orthonormalize(se3.from_rt(PR, df64.to_f32(Pt)))


def _dd_cost(state: PoseGraphState, cfg: PoseGraphConfig):
    r = _residuals_dd0(state, cfg)
    return 0.5 * jnp.sum(r * r)


class OptimizeResult(NamedTuple):
    poses: jnp.ndarray
    final_error: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("cfg", "max_iterations"))
def optimize(
    state: PoseGraphState,
    cfg: PoseGraphConfig = PoseGraphConfig(),
    max_iterations: int | None = None,
    resume: OptimizeResult | None = None,
) -> OptimizeResult:
    """Levenberg-Marquardt over the whole graph (replaces pose_graph.cpp:147-171).

    Outer LM loop: linearize at current poses (via jvp/vjp — J is never
    formed), CG-solve (J^T J + lambda I) d = -J^T r, retract, accept/reject
    with GTSAM's lambda schedule, stop on relative/absolute error tolerance.

    ``max_iterations`` overrides ``cfg.max_iterations`` for THIS call —
    used to bound the LM work inside a single device dispatch: a full-scale
    (4,500-pose) first correction can need minutes of LM x CG inside one
    program, which the tunneled TPU runtime kills as a hung worker. Bounded
    chunks + ``resume`` (the previous chunk's result; its lambda is NOT
    carried — restarting at lambda_init after accepted steps matches a fresh
    warm-started call) let the host iterate to convergence; see
    :func:`optimize_chunked`.
    """
    F = state.poses.shape[0]
    zero = jnp.zeros((F, 6), jnp.float32)
    if max_iterations is not None:
        cfg = dataclasses.replace(cfg, max_iterations=max_iterations)
    if resume is not None:
        state = state._replace(poses=resume.poses)

    def cost_at(poses):
        return 0.5 * jnp.sum(
            _residuals(state._replace(poses=poses), zero, cfg) ** 2
        )

    def lm_cond(c):
        it, _, lam, _, done = c
        return jnp.logical_and(
            it < cfg.max_iterations,
            jnp.logical_and(jnp.logical_not(done), lam <= cfg.lambda_max),
        )

    def lm_body(c):
        it, poses, lam, cost, done = c
        st = state._replace(poses=poses)

        if cfg.relative_param:
            def rfun(d):
                return _residuals_rel(st, d, cfg)

            def retract(d):
                return _poses_from_rel_deltas(st, d)
        else:
            def rfun(d):
                return _residuals(st, d, cfg)

            def retract(d):
                return se3.compose(poses, se3.exp(d))

        if cfg.relative_param and cfg.solver == "woodbury":
            # Exact damped-GN step: hand-linearized diagonal + rank-6L
            # structure — no autodiff through the pose-chain scan, no CG.
            # (The emulated-f64 variant lives in optimize_dd — its phases
            # must be SEPARATE XLA programs with materialized hand-offs,
            # which a while_loop body cannot provide; see _dd_prep.)
            r0 = rfun(zero)
            delta = _woodbury_solve(st, cfg, lam, r0)
        else:
            r0, jvp_lin = jax.linearize(rfun, zero)
            _, vjp = jax.vjp(rfun, zero)

            def matvec(x):
                (jt,) = vjp(jvp_lin(x))
                return jt + lam * x

            (g,) = vjp(r0)  # J^T r
            delta = _cg_solve(matvec, -g, cfg.cg_iterations, cfg.cg_tolerance)
        new_poses = se3.orthonormalize(retract(delta))
        new_cost = cost_at(new_poses)
        accept = new_cost < cost

        poses = jnp.where(accept, new_poses, poses)
        lam = jnp.where(accept, lam / cfg.lambda_factor, lam * cfg.lambda_factor)
        decrease = cost - new_cost
        conv = accept & (
            (decrease < cfg.absolute_error_tol)
            | (decrease < cfg.relative_error_tol * cost)
        )
        cost = jnp.where(accept, new_cost, cost)
        return (it + 1, poses, lam, cost, conv)

    cost0 = cost_at(state.poses)
    init = (jnp.int32(0), state.poses, jnp.float32(cfg.lambda_init), cost0, jnp.bool_(False))
    it, poses, _, cost, done = jax.lax.while_loop(lm_cond, lm_body, init)
    return OptimizeResult(poses=poses, final_error=cost, iterations=it, converged=done)


@functools.lru_cache(maxsize=None)
def _dd_fns(cfg: PoseGraphConfig, F: int, L: int):
    """Jitted phases of one emulated-f64 LM iteration, one entry per
    (config, shape bucket). Four SEPARATE programs — prep, core, apply,
    cost — with every cross-phase value materialized as a parameter; see
    _dd_prep's docstring for why this structure is load-bearing."""
    return {
        "prep": jax.jit(functools.partial(_dd_prep, cfg=cfg)),
        "core": jax.jit(functools.partial(_dd_core, cfg)),
        "sys": jax.jit(functools.partial(_dd_system, cfg)),
        "fin": jax.jit(functools.partial(_dd_fin, cfg)),
        "apply": jax.jit(functools.partial(_dd_apply, cfg=cfg)),
        "cost": jax.jit(functools.partial(_dd_cost, cfg=cfg)),
    }


def compact_loops(state: PoseGraphState) -> PoseGraphState:
    """HOST-side loop-factor compaction to the accepted count, padded to a
    power of two for jit-cache reuse.

    Usable only from host-driven paths (it fetches ``loop_valid``). Every
    optimizer's per-iteration cost scales with the loop axis — K assembly
    gathers O(L^2) 6x6 blocks and the K-Cholesky is O((6L)^3) — so solving
    at the 512 CAPACITY wastes ~10-4000x the work of the ~tens-to-hundreds
    of real loops. The in-graph (jit) analog with static shapes is
    :func:`window_loops`.
    """
    import numpy as np

    valid = np.asarray(state.loop_valid)
    sel = np.flatnonzero(valid)
    Lc = max(1, 1 << (max(len(sel), 1) - 1).bit_length())
    if Lc >= valid.shape[0]:
        return state
    pad = Lc - len(sel)
    lf = np.concatenate([np.asarray(state.loop_from)[sel], np.zeros(pad, np.int32)])
    lt = np.concatenate([np.asarray(state.loop_to)[sel], np.zeros(pad, np.int32)])
    lr = np.concatenate(
        [np.asarray(state.loop_rel)[sel],
         np.tile(np.eye(4, dtype=np.float32), (pad, 1, 1))])
    lv = np.concatenate([np.ones(len(sel), bool), np.zeros(pad, bool)])
    return state._replace(
        loop_from=jnp.asarray(lf, jnp.int32),
        loop_to=jnp.asarray(lt, jnp.int32),
        loop_rel=jnp.asarray(lr, jnp.float32),
        loop_valid=jnp.asarray(lv),
        n_loops=jnp.minimum(state.n_loops, jnp.int32(Lc)),
    )


_DD_HEALTH: bool | None = None


def reset_dd_health(value: bool | None = None) -> None:
    """Test hook: clear (or force) the cached DD health verdict."""
    global _DD_HEALTH
    _DD_HEALTH = value


def dd_backend_healthy(probe: bool = True) -> bool:
    """One-time runtime gate for the emulated-f64 tier.

    The double-single arithmetic in ``ops/df64`` is only correct if the
    compiler preserves the error-free transforms exactly — no FMA
    contraction of ``a*b - hi``, no reassociation (observed failure mode
    on a hypothetical toolchain regression: 4.7e5x-wrong LM steps, see
    ``_dd_prep``'s docstring). XLA's default semantics guarantee this
    today, but a TPU toolchain bump could silently regress it, and a
    corrupted finalize is worse than a slower one. So before the FIRST
    ``optimize_dd`` dispatch of the process, run:

    1. ``df64.selftest()`` — cancellation-heavy sum/dot vs f64 ground
       truth (~1e-14 healthy, ~1e-7 if the EFTs are broken), and
    2. a known-answer probe: a tiny perturbed 8-pose chain with one loop,
       where the DD LM must reach (within 4x) the NumPy-f64 host LM's
       optimum cost — exercising the real staged 4-program pipeline.

    On failure the precision ladder (``optimize_chunked``,
    ``parallel.batched._rescue_lane``) skips the DD tier and escalates
    straight to the f64 host backstop — same answers, host-bound finalize.
    The verdict is cached for the process lifetime.
    """
    global _DD_HEALTH
    if _DD_HEALTH is not None:
        return _DD_HEALTH
    import warnings

    from ..ops import df64

    try:
        err = df64.selftest()
        healthy = err < 1e-12
        if not healthy:
            cause = f"df64 selftest failed (EFT error {err:.2e})"
        elif probe and not _dd_known_answer_probe():
            healthy = False
            cause = (
                "df64 known-answer probe failed (selftest EFT error "
                f"{err:.2e} is healthy, but the staged DD LM missed the "
                "f64 host optimum on the probe graph)"
            )
        if not healthy:
            warnings.warn(
                f"{cause} — the emulated-f64 pose-graph tier is disabled; "
                "finalize falls back to the f64 host LM (slower, same "
                "results)."
            )
    except Exception as e:  # a broken DD tier must never abort finalize
        warnings.warn(f"df64 health check raised ({e}); DD tier disabled.")
        healthy = False
    _DD_HEALTH = healthy
    return healthy


def _dd_known_answer_probe() -> bool:
    """Tiny perturbed chain whose f64 optimum is known: DD must match it."""
    import numpy as np

    F, L = 8, 4
    rng = np.random.default_rng(7)
    gt = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    gt[:, 0, 3] = np.arange(F, dtype=np.float32) * 1.2
    odom_rel = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    odom_rel[1:, 0, 3] = 1.2
    init = gt.copy()
    init[1:, :3, 3] += rng.normal(0.0, 0.05, (F - 1, 3)).astype(np.float32)
    lrel = np.tile(np.eye(4, dtype=np.float32), (L, 1, 1))
    lrel[0, 0, 3] = (F - 1) * 1.2  # loop 0 -> F-1, consistent with odometry
    st = PoseGraphState(
        poses=jnp.asarray(init),
        n_poses=jnp.int32(F),
        odom_rel=jnp.asarray(odom_rel),
        odom_valid=jnp.asarray(np.arange(F) >= 1),
        odom_scale=jnp.ones((F,), jnp.float32),
        loop_from=jnp.zeros((L,), jnp.int32),
        loop_to=jnp.asarray(
            np.where(np.arange(L) == 0, F - 1, 0).astype(np.int32)
        ),
        loop_rel=jnp.asarray(lrel),
        loop_valid=jnp.asarray(np.arange(L) == 0),
        n_loops=jnp.int32(1),
        n_loops_dropped=jnp.int32(0),
    )
    cfg = PoseGraphConfig()
    dd = optimize_dd(st, cfg)
    host = optimize_host(st, cfg)
    dd_cost = float(dd.final_error)
    host_cost = float(host.final_error)
    return bool(
        np.isfinite(dd_cost)
        and np.isfinite(np.asarray(dd.poses)).all()
        and dd_cost <= max(4.0 * host_cost, host_cost + 1e-6)
    )


def optimize_dd(
    state: PoseGraphState,
    cfg: PoseGraphConfig = PoseGraphConfig(),
    max_iterations: int | None = None,
    resume: OptimizeResult | None = None,
) -> OptimizeResult:
    """ON-DEVICE emulated-f64 LM for KITTI-extent graphs (replaces the f64
    host rescue as the primary precision backstop; pose_graph.cpp:147-171 is
    the GTSAM f64 solve this stands in for).

    Host-driven outer loop, four jitted XLA programs per LM iteration
    (prep -> core -> apply -> cost, :func:`_dd_fns`). The loop must live on
    the host for two reasons: the DD pipeline's shared f32 inputs must be
    MATERIALIZED between programs (see :func:`_dd_prep` — a fused program
    rematerializes them per consumer with different rounding and the step
    breaks), which a ``lax.while_loop`` body cannot provide; and this keeps
    each device dispatch bounded, which the tunneled TPU runtime requires
    anyway (see :func:`optimize_chunked`).

    Loop factors are COMPACTED to the accepted count (padded to a power of
    two for jit-cache reuse) before dispatch: the DD Cholesky is O((6L)^3)
    sequential, so running at the 512-loop CAPACITY would waste ~4000x the
    work of the ~tens of real loops (same reasoning as optimize_host's
    compaction).
    """
    max_it = cfg.max_iterations if max_iterations is None else max_iterations
    if resume is not None:
        state = state._replace(poses=resume.poses)

    cstate = compact_loops(state)

    def lm(cstate, cfg, budget):
        from ..ops import df64

        fns = _dd_fns(cfg, cstate.poses.shape[0], cstate.loop_from.shape[0])
        lam = cfg.lambda_init
        it = 0
        conv = False
        cost = None
        while it < budget and lam <= cfg.lambda_max and not conv:
            r0, c0, g_diag, G, X, Dinv, segf, lo, hi = fns["prep"](
                cstate, jnp.float32(lam))
            if cost is None:
                cost = float(c0)
            if cfg.dd_solve == "pcg":
                # fast tier: system assembly on device, host-driven
                # f32-preconditioned DD PCG + outer-system iterative
                # refinement for alpha (df64.solve_pcg_refined — the
                # refinement makes the forward error backward-consistent,
                # which the ~9-order Woodbury cancellation in fin
                # requires), back-substitution on device — every hand-off
                # materialized
                Kdd, btv, y1 = fns["sys"](r0, g_diag, G, X, Dinv, segf,
                                          lo, hi)
                alpha = df64.solve_pcg_refined(Kdd, btv)
                d = fns["fin"](y1, alpha, G, X, Dinv, segf)
            else:
                d = fns["core"](r0, g_diag, G, X, Dinv, segf, lo, hi)
            new_poses = fns["apply"](cstate, d)
            c1 = float(fns["cost"](cstate._replace(poses=new_poses)))
            it += 1
            if c1 < cost:
                decrease = cost - c1
                conv = (decrease < cfg.absolute_error_tol
                        or decrease < cfg.relative_error_tol * cost)
                cstate = cstate._replace(poses=new_poses)
                cost = c1
                lam = max(lam / cfg.lambda_factor, 1e-12)
            else:
                lam = lam * cfg.lambda_factor
        return cstate, cost, it, conv

    orig = cstate
    cstate, cost, it, conv = lm(cstate, cfg, max_it)
    if not conv and cfg.dd_solve == "pcg":
        # The fast K-solve tier (f32-preconditioned DD PCG) can fail when
        # the SCALED K conditioning overwhelms the lifted f32 factor — and
        # its garbage-but-cost-decreasing steps can drag the poses into a
        # basin no exact step escapes (measured: direct-from-pcg-end stalls
        # at 6.4e8 while direct-from-original reaches 4.12). Retry with the
        # backward-stable direct DD Cholesky FROM THE ORIGINAL POSES.
        cstate, cost2, it2, conv = lm(
            orig, dataclasses.replace(cfg, dd_solve="direct"), max_it
        )
        cost = cost2 if cost2 is not None else cost
        it += it2
    return OptimizeResult(
        poses=cstate.poses,
        final_error=jnp.float32(cost),
        iterations=jnp.int32(it),
        converged=jnp.bool_(conv),
    )


def optimize_host(state: PoseGraphState, cfg: PoseGraphConfig,
                  max_iterations: int | None = None) -> OptimizeResult:
    """f64 Woodbury LM on the HOST — the precision backstop.

    The relative-parameterization normal equations are fundamentally
    f64-scale at KITTI extents: whitened lever arms reach |t|/sigma ~ 750 m
    / 5 mrad ~ 1.5e5, so J^T J spans ~1e10 of dynamic range and EVERY f32
    formulation of the solve (CG or Woodbury, any stage) destroys the step
    (measured: bisecting f32 into any single stage of the f64 pipeline
    raises the one-step cost from 1.2e7 to >1e9 on a drifted 4,500-pose
    chain). This mirrors why the reference leans on GTSAM's f64 direct
    solves (pose_graph.cpp:147-160). Device LM steps stay f32 (cheap,
    cost-guarded — a bad step is rejected, never corrupting); this host
    solve runs at finalize (or on demand) when the device chunks report
    non-convergence. NumPy f64 end to end; ~0.1 s/iteration at 4,500 poses.
    """
    import numpy as np

    F = int(state.poses.shape[0])
    n = int(state.n_poses)
    max_it = cfg.max_iterations if max_iterations is None else max_iterations

    T = np.asarray(state.poses, np.float64)
    odom_rel = np.asarray(state.odom_rel, np.float64)
    odom_valid = np.asarray(state.odom_valid)
    odom_scale = np.asarray(state.odom_scale, np.float64)
    lf = np.asarray(state.loop_from)
    lt = np.asarray(state.loop_to)
    loop_rel = np.asarray(state.loop_rel, np.float64)
    loop_valid = np.asarray(state.loop_valid)
    # Compact to ACCEPTED loops: the device solver must run at the static
    # ``max_loop_factors`` capacity, but here shapes are dynamic and the
    # Woodbury K-solve is O((6L)^3) — at the default capacity 512 that is a
    # 3072^2 dense solve (~2.4 s/iteration at F=1500) vs ~ms for the tens of
    # loops actually accepted.
    sel = np.flatnonzero(loop_valid)
    lf, lt, loop_rel, loop_valid = lf[sel], lt[sel], loop_rel[sel], loop_valid[sel]
    L = lf.shape[0]

    ps, osig, lsig = (np.asarray(s, np.float64) for s in _whiten(cfg))
    k = np.arange(1, F)
    odom_w = (odom_valid[1:] & (k < n)).astype(np.float64)
    sc = np.maximum(odom_scale[1:], 1e-12)
    w_odom = odom_w[:, None] / (osig[None, :] * sc[:, None])
    w_prior = 1.0 / ps
    lw = loop_valid.astype(np.float64)
    w_loop = lw[:, None] / lsig[None, :]
    lo = np.minimum(lf, lt)
    hi = np.maximum(lf, lt)
    sgn = np.where(lt >= lf, 1.0, -1.0)

    def hat(v):
        out = np.zeros(v.shape[:-1] + (3, 3))
        out[..., 0, 1], out[..., 0, 2] = -v[..., 2], v[..., 1]
        out[..., 1, 0], out[..., 1, 2] = v[..., 2], -v[..., 0]
        out[..., 2, 0], out[..., 2, 1] = -v[..., 1], v[..., 0]
        return out

    def adj(Ts):
        R, t = Ts[..., :3, :3], Ts[..., :3, 3]
        top = np.concatenate([R, np.zeros_like(R)], -1)
        bot = np.concatenate([hat(t) @ R, R], -1)
        return np.concatenate([top, bot], -2)

    def log_se3(Ts):
        R, t = Ts[..., :3, :3], Ts[..., :3, 3]
        tr = np.clip((np.trace(R, axis1=-2, axis2=-1) - 1.0) / 2.0, -1.0, 1.0)
        th = np.arccos(tr)
        sin_th = np.sin(th)
        ax = np.stack(
            [R[..., 2, 1] - R[..., 1, 2], R[..., 0, 2] - R[..., 2, 0],
             R[..., 1, 0] - R[..., 0, 1]], -1)
        small = th < 1e-7
        fac = np.where(small, 0.5 + th * th / 12.0,
                       th / np.maximum(2.0 * sin_th, 1e-300))
        w = ax * fac[..., None]
        W = hat(w)
        th2 = np.maximum(th * th, 1e-300)
        B = np.where(small, 1.0 / 12.0,
                     (1.0 - (th * np.cos(th / 2.0))
                      / np.maximum(2.0 * np.sin(th / 2.0), 1e-300)) / th2)
        I = np.broadcast_to(np.eye(3), W.shape)
        Vinv = I - 0.5 * W + B[..., None, None] * (W @ W)
        v = np.einsum("...ij,...j->...i", Vinv, t)
        return np.concatenate([w, v], -1)

    rels = np.linalg.inv(T[:-1]) @ T[1:]
    meas_inv_odom = np.linalg.inv(odom_rel[1:])
    meas_inv_loop = np.linalg.inv(loop_rel)

    def residuals(P):
        rp = (log_se3(P[0]) * w_prior)[None, :]
        rel_cur = np.linalg.inv(P[:-1]) @ P[1:]
        ro = log_se3(meas_inv_odom @ rel_cur) * w_odom
        rl = log_se3(
            meas_inv_loop @ (np.linalg.inv(P[lf]) @ P[lt])
        ) * w_loop
        return rp, ro, rl

    def cost_of(parts):
        return 0.5 * sum(float(np.sum(r * r)) for r in parts)

    def orthonorm(P):
        u, _, vt = np.linalg.svd(P[..., :3, :3])
        out = P.copy()
        out[..., :3, :3] = u @ vt
        return out

    P = T.copy()
    parts = residuals(P)
    cost = cost_of(parts)
    lam = cfg.lambda_init
    it = 0
    conv = False
    while it < max_it and lam <= cfg.lambda_max and not conv:
        rels_P = np.linalg.inv(P[:-1]) @ P[1:]
        G = adj(P)
        H = adj(np.linalg.inv(P[lt]))
        X = sgn[:, None, None] * w_loop[:, :, None] * H
        D = np.concatenate([(w_prior**2)[None, :], w_odom**2], 0) + lam
        Dinv = 1.0 / D
        rp, ro, rl = parts

        def B_apply(y):
            c = np.einsum("lji,lj->li", X, y)
            diff = np.zeros((F + 1, 6))
            np.add.at(diff, lo + 1, c)
            np.add.at(diff, hi + 1, -c)
            return np.einsum("fji,fj->fi", G, np.cumsum(diff[:F], 0))

        g = np.concatenate([(w_prior * rp[0])[None, :], w_odom * ro], 0)
        g = g + B_apply(rl)
        GDG = np.einsum("fij,fj,fkj->fik", G, Dinv, G)
        S = np.cumsum(GDG, 0)
        a = np.maximum(lo[:, None], lo[None, :])
        b = np.minimum(hi[:, None], hi[None, :])
        M = np.where((b > a)[..., None, None], S[b] - S[a], 0.0)
        K = np.einsum("lab,lmbc,mdc->lamd", X, M, X).reshape(L * 6, L * 6)
        K = K + np.eye(L * 6)
        y1 = Dinv * (-g)
        V = np.cumsum(np.einsum("fij,fj->fi", G, y1), 0)
        bt = np.einsum("lij,lj->li", X, V[hi] - V[lo]).reshape(-1)
        alpha = np.linalg.solve(K, bt).reshape(L, 6)
        d = y1 - Dinv * B_apply(alpha)

        # retract: rebuild poses through the relative chain
        def exp_se3(xi):
            w, v = xi[..., :3], xi[..., 3:]
            th = np.linalg.norm(w, axis=-1)
            W = hat(w)
            th2 = np.maximum(th * th, 1e-300)
            A = np.where(th < 1e-7, 1.0 - th2 / 6.0, np.sin(th) / np.maximum(th, 1e-300))
            Bc = np.where(th < 1e-7, 0.5 - th2 / 24.0, (1.0 - np.cos(th)) / th2)
            C = np.where(th < 1e-7, 1.0 / 6.0 - th2 / 120.0,
                         (th - np.sin(th)) / np.maximum(th2 * th, 1e-300))
            I = np.broadcast_to(np.eye(3), W.shape)
            R = I + A[..., None, None] * W + Bc[..., None, None] * (W @ W)
            Vm = I + Bc[..., None, None] * W + C[..., None, None] * (W @ W)
            out = np.broadcast_to(np.eye(4), xi.shape[:-1] + (4, 4)).copy()
            out[..., :3, :3] = R
            out[..., :3, 3] = np.einsum("...ij,...j->...i", Vm, v)
            return out

        E = exp_se3(d)
        newP = np.empty_like(P)
        newP[0] = P[0] @ E[0]
        M0 = rels_P @ E[1:]
        for m in range(1, F):
            newP[m] = newP[m - 1] @ M0[m - 1]
        newP = orthonorm(newP)
        new_parts = residuals(newP)
        new_cost = cost_of(new_parts)
        if new_cost < cost:
            decrease = cost - new_cost
            conv = (decrease < cfg.absolute_error_tol
                    or decrease < cfg.relative_error_tol * cost)
            P, parts, cost = newP, new_parts, new_cost
            lam = max(lam / cfg.lambda_factor, 1e-12)
        else:
            lam *= cfg.lambda_factor
        it += 1

    return OptimizeResult(
        poses=jnp.asarray(P.astype(np.float32)),
        final_error=jnp.float32(cost),
        iterations=jnp.int32(it),
        converged=jnp.bool_(conv),
    )


def optimize_chunked(
    state: PoseGraphState,
    cfg: PoseGraphConfig = PoseGraphConfig(),
    chunk: int = 10,
    timing: dict | None = None,
) -> OptimizeResult:
    """Host-driven LM-to-convergence in bounded device dispatches.

    Each dispatch runs at most ``chunk`` LM iterations (the one host sync per
    chunk reads the 1-bit done flag). Needed at full KITTI scale: an
    unbounded first correction (drifted 4,500-pose chain) runs minutes of
    LM x CG inside one program and the tunneled TPU runtime kills the worker
    as hung. GTSAM (pose_graph.cpp:147-160) iterates on the host for the
    same effect.

    ``timing``: optional dict populated with per-tier wall seconds and
    iteration counts (``f32_s``/``f32_it``, ``dd_s``/``dd_it``,
    ``host_s``/``host_it``) — each tier boundary already syncs (the chunk
    loop reads the done flag on the host), so the splits are honest.
    """
    import time as _time

    t0 = _time.perf_counter()
    # Host-driven path: compact loop factors to the accepted count before
    # the f32 chunks too (optimize_dd/optimize_host already did) — the
    # Woodbury K assembly gathers O(L^2) blocks and Cholesky-factors
    # (6L)^2 at the CAPACITY otherwise (measured: 4.8 s of each full-scale
    # bench run at L=512 with 148 accepted loops).
    state = compact_loops(state)
    res = None
    total_it = 0
    prev_err = float("inf")
    for _ in range((cfg.max_iterations + chunk - 1) // chunk):
        res = optimize(state, cfg, max_iterations=chunk, resume=res)
        total_it += int(res.iterations)
        if bool(res.converged) or int(res.iterations) < chunk:
            break
        err = float(res.final_error)
        if err > prev_err * 0.99:
            # a whole chunk moved the cost < 1% — f32 has hit its dynamic-
            # range wall on this graph; stop burning device chunks and go
            # straight to the f64 host rescue below
            break
        prev_err = err
    if timing is not None:
        timing["f32_s"] = _time.perf_counter() - t0
        timing["f32_it"] = total_it
        t0 = _time.perf_counter()
    if (not bool(res.converged) and cfg.solver == "woodbury"
            and dd_backend_healthy()):
        # Device f32 LM stalled: the Woodbury K matrix needs ~1e-11 relative
        # precision at KITTI extents (f32 assembly makes it indefinite).
        # Escalate to the ON-DEVICE emulated-f64 solver (ops/df64.py) —
        # same factor model, K-pipeline in double-single arithmetic, one
        # bounded dispatch per LM iteration. Gated by a one-time runtime
        # selftest + known-answer probe (dd_backend_healthy): if a compiler
        # change ever breaks the error-free transforms, we fall through to
        # the f64 host backstop below instead of silently corrupting poses.
        res = optimize_dd(state, cfg, resume=res)
        total_it += int(res.iterations)
        if timing is not None:
            timing["dd_s"] = _time.perf_counter() - t0
            timing["dd_it"] = int(res.iterations)
            t0 = _time.perf_counter()
    if not bool(res.converged):
        # Last-resort precision backstop: true f64 on the host (same code
        # path GTSAM's CPU solve represents for the reference).
        host = optimize_host(
            state._replace(poses=res.poses), cfg,
            max_iterations=cfg.max_iterations,
        )
        if float(host.final_error) < float(res.final_error):
            res = host
        total_it += int(host.iterations)
        if timing is not None:
            timing["host_s"] = _time.perf_counter() - t0
            timing["host_it"] = int(host.iterations)
    return OptimizeResult(
        poses=res.poses,
        final_error=res.final_error,
        iterations=jnp.int32(total_it),
        converged=res.converged,
    )
