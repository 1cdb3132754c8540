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


class OptimizeResult(NamedTuple):
    poses: jnp.ndarray
    final_error: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("cfg",))
def optimize(state: PoseGraphState, cfg: PoseGraphConfig = PoseGraphConfig()) -> OptimizeResult:
    """Levenberg-Marquardt over the whole graph (replaces pose_graph.cpp:147-171).

    Outer LM loop: linearize at current poses (via jvp/vjp — J is never
    formed), CG-solve (J^T J + lambda I) d = -J^T r, retract, accept/reject
    with GTSAM's lambda schedule, stop on relative/absolute error tolerance.
    """
    F = state.poses.shape[0]
    zero = jnp.zeros((F, 6), jnp.float32)

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
