"""Point-to-plane ICP as a jit-compiled fixed-shape program.

Replaces the reference's dynamic iteration loop (icp.hpp:157-258) with a
``lax.while_loop`` over a frozen-shape carry: same per-iteration math
(1-NN correspondences -> RMS plane error -> convergence test -> Gauss-Newton
6-DoF solve -> left-composed delta), same convergence/bookkeeping semantics:

- error recorded *before* the solve each iteration (icp.hpp:198-207),
- converge if err < min_error or |prev - err| < tolerance (icp.hpp:210-217),
- ``converged`` stays False if the budget is exhausted (reference quirk #2),
- final error recomputed after the loop and appended (icp.hpp:235-252),
- ``num_iterations = len(error_history) - 1`` (icp.hpp:255).

Consciously fixed (SURVEY.md quirk #1): the reference queries the KD-tree
twice per iteration (icp.hpp:185 and :190); here one 1-NN pass yields both the
matched points and the normal indices.

The Gauss-Newton step mirrors solve_point_to_plane (icp.hpp:89-144):
J_i = [p_i x n_i, n_i], b_i = (q_i - p_i) . n_i, 6x6 normal equations, then
delta = [Rodrigues(x[:3]), x[3:]] — note the reference applies the raw
translation (no SE(3) V-matrix), which is matched exactly.

Unlike the reference, target normals are an *input*: the engine estimates
them once per scan and caches them (the reference recomputes them on every
ICP call, icp.hpp:166-171 — pure waste when a scan is reused as a target).
Use :func:`icp_point_to_plane_auto` for the self-contained reference-shaped
API.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import ICPConfig
from ..types import ICPResult, PointCloud, strided_prefix_idx
from . import se3
from .knn import nn1
from .linalg import solve_psd_small
from .normals import estimate_normals


def solve_point_to_plane(
    src: jnp.ndarray,
    tgt_matched: jnp.ndarray,
    normals: jnp.ndarray,
    weights: jnp.ndarray,
    damping: float = 1e-9,
) -> jnp.ndarray:
    """One Gauss-Newton step; returns the (4, 4) delta transform.

    Mirrors icp.hpp:89-144 with masked rows: invalid correspondences get
    weight 0. The normal equations are mean-normalized (instead of summed)
    for f32 conditioning — the solution is identical.
    """
    pxn = jnp.cross(src, normals)
    J = jnp.concatenate([pxn, normals], axis=-1)          # (N, 6)
    b = jnp.sum((tgt_matched - src) * normals, axis=-1)   # (N,)
    w = weights.astype(src.dtype)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    Jw = J * w[:, None]
    prec = jax.lax.Precision.HIGHEST  # f32-accurate normal equations on the MXU
    A = jnp.matmul(Jw.T, J, precision=prec) / denom + damping * jnp.eye(6, dtype=src.dtype)
    rhs = jnp.matmul(Jw.T, b, precision=prec) / denom
    # unrolled 6x6 Cholesky — jnp.linalg.solve's LU costs ~100 ms on TPU
    x = solve_psd_small(A, rhs)
    R = se3.exp_so3(x[:3])     # Rodrigues (icp.hpp:126-141)
    return se3.from_rt(R, x[3:])  # raw translation, as in the reference


class _Carry(NamedTuple):
    it: jnp.ndarray
    T: jnp.ndarray
    prev_err: jnp.ndarray
    converged: jnp.ndarray
    hist: jnp.ndarray
    # correspondences from the last executed iteration: on a CONVERGED exit
    # T was frozen, so these equal the final pass exactly and the post-loop
    # NN search (icp.hpp:235-252) can be skipped — ~1 of ~4 NN passes saved
    cur: jnp.ndarray      # (S, 3)
    matched: jnp.ndarray  # (S, 3)
    nrm: jnp.ndarray      # (S, 3)


def _plane_error(cur, matched, normals, w, denom):
    d = jnp.sum((matched - cur) * normals, axis=-1)
    return jnp.sqrt(jnp.sum(d * d * w) / denom)


def icp_point_to_plane(
    src: PointCloud,
    tgt: PointCloud,
    tgt_normals: jnp.ndarray,
    config: ICPConfig = ICPConfig(),
    init_transform: Optional[jnp.ndarray] = None,
    nn1_fn: Optional[Callable] = None,
    inactive=None,
) -> ICPResult:
    """Register ``src`` onto ``tgt``: returns T with T(src) ~= tgt.

    ``nn1_fn(src_pts, tgt_pts, tgt_mask) -> (idx, dist2)`` is injectable so the
    engine can swap in the Pallas 1-NN kernel on TPU. A backend that needs a
    per-target acceleration structure (e.g. the sorted-grid search) may carry
    a ``prepare(tgt_pts, tgt_mask) -> (src_pts -> (idx, dist2))`` attribute;
    it is invoked ONCE here (the reference rebuilds its KD-tree on every ICP
    call, icp.hpp:166) and the returned closure queries it each iteration.

    A FUSED backend may instead carry
    ``prepare_match(tgt_pts, tgt_mask, tgt_normals) -> (cur -> (matched,
    normals, dist2))`` returning the matched target points and normals
    directly (selected inside the kernel) — this skips the per-iteration
    HBM gather of ``tgt[idx]`` / ``normals[idx]`` entirely
    (ops/knn_pallas.match_slab_pallas).

    ``inactive``: traced bool — when True the iteration loop is skipped (the
    while_loop starts converged) and only the final correspondence pass runs.
    Cheap runtime gating without lax.cond (whose branches capturing multi-GB
    buffers crash the TPU compiler at large shapes).
    """
    if nn1_fn is None:
        nn1_fn = lambda s, t, m: nn1(s, t, m)
    if init_transform is None:
        init_transform = se3.identity(src.points.dtype)

    if 0 < config.target_points < tgt.points.shape[0]:
        # Strided target subsample (see ICPConfig.target_points): the
        # correspondence search runs against the reduced set; normals are
        # gathered with the same stride so indices stay consistent.
        t_idx = strided_prefix_idx(tgt.count(), config.target_points)
        tgt = PointCloud(tgt.points[t_idx], tgt.mask[t_idx])
        tgt_normals = tgt_normals[t_idx]

    prepare_match = getattr(nn1_fn, "prepare_match", None)
    if prepare_match is not None:
        match_q = prepare_match(tgt.points, tgt.mask, tgt_normals)

        def match_query(cur):
            m, n, _ = match_q(cur)
            return m, n

    else:
        prepare = getattr(nn1_fn, "prepare", None)
        if prepare is not None:
            nn_query = prepare(tgt.points, tgt.mask)
        else:
            nn_query = lambda s: nn1_fn(s, tgt.points, tgt.mask)

        def match_query(cur):
            idx, _ = nn_query(cur)
            return tgt.points[idx], tgt_normals[idx]

    # Displace invalid source rows to the far sentinel: their contributions
    # are weight-masked everywhere, but tile-extent-based backends (slab
    # pruning) must not see padding at the origin polluting tile bounds.
    src = PointCloud(
        jnp.where(src.mask[:, None], src.points, 1.0e6), src.mask
    )
    full_src = src
    if 0 < config.sample_points < src.points.shape[0]:
        src = src.subsample(config.sample_points)

    # Coarse warm start: a few fixed GN steps on a small source subset.
    if config.coarse_iterations > 0 and config.coarse_sample < src.points.shape[0]:
        csrc = full_src.subsample(config.coarse_sample)
        cw = csrc.mask.astype(csrc.points.dtype)
        cdenom = jnp.maximum(jnp.sum(cw), 1.0)

        def coarse_body(i, T):
            cur = se3.apply(T, csrc.points)
            matched, nrm = match_query(cur)
            delta = solve_point_to_plane(
                cur, matched, nrm, csrc.mask, config.solver_damping,
            )
            return se3.compose(delta, T)

        init_transform = jax.lax.fori_loop(
            0, config.coarse_iterations, coarse_body,
            jnp.asarray(init_transform, src.points.dtype),
        )
        del cw, cdenom

    w = src.mask.astype(src.points.dtype)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    max_it = config.max_iterations

    def correspondences(T):
        cur = se3.apply(T, src.points)
        matched, nrm = match_query(cur)
        return cur, matched, nrm

    def cond(c: _Carry):
        return jnp.logical_and(c.it < max_it, jnp.logical_not(c.converged))

    def body(c: _Carry):
        cur, matched, nrm = correspondences(c.T)
        err = _plane_error(cur, matched, nrm, w, denom)
        hist = c.hist.at[c.it].set(err)
        conv = jnp.logical_or(
            err < config.min_error, jnp.abs(c.prev_err - err) < config.tolerance
        )
        delta = solve_point_to_plane(cur, matched, nrm, src.mask, config.solver_damping)
        T_new = jnp.where(conv, c.T, se3.compose(delta, c.T))
        return _Carry(c.it + 1, T_new, err, conv, hist, cur, matched, nrm)

    start_conv = (
        jnp.bool_(False) if inactive is None else jnp.asarray(inactive, bool)
    )
    zeros3 = jnp.zeros_like(src.points)
    init = _Carry(
        it=jnp.int32(0),
        T=jnp.asarray(init_transform, src.points.dtype),
        prev_err=jnp.asarray(jnp.inf, src.points.dtype),
        converged=start_conv,
        hist=jnp.zeros((max_it + 1,), src.points.dtype),
        cur=zeros3,
        matched=zeros3,
        nrm=zeros3,
    )
    out = jax.lax.while_loop(cond, body, init)

    # Final error with final correspondences (icp.hpp:235-252). On a
    # CONVERGED exit the last iteration froze T before exiting, so its
    # correspondences ARE the final ones (bit-exact) — recompute only on
    # budget exhaustion (T moved after the last search) or a zero-iteration
    # start. lax.cond executes one branch: the common converged path skips
    # a whole NN pass.
    cur, matched, nrm = jax.lax.cond(
        out.converged & (out.it > 0),
        lambda _: (out.cur, out.matched, out.nrm),
        lambda _: correspondences(out.T),
        operand=None,
    )
    final_err = _plane_error(cur, matched, nrm, w, denom)
    hist = out.hist.at[out.it].set(final_err)

    return ICPResult(
        transformation=out.T,
        converged=out.converged,
        num_iterations=out.it,
        error_history=hist,
        final_error=final_err,
    )


def icp_point_to_plane_auto(
    src: PointCloud,
    tgt: PointCloud,
    config: ICPConfig = ICPConfig(),
    init_transform: Optional[jnp.ndarray] = None,
) -> ICPResult:
    """Reference-shaped API: estimates target normals internally
    (icp.hpp:166-171) then registers."""
    normals = estimate_normals(tgt.points, tgt.mask, k=config.normal_k)
    return icp_point_to_plane(src, tgt, normals, config, init_transform)
