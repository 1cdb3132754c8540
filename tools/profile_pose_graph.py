#!/usr/bin/env python
"""Pose-graph LM at full KITTI scale: convergence + wall time.

Builds a 4,500-pose synthetic graph (circular GT route, noisy odometry
chain, 20 accurate loop closures between revisit pairs), then:
- optimizes from the drifted chain (the expensive first correction),
- re-optimizes warm-started (the steady-state cost the engine pays on
  every subsequent accepted loop),
and reports ATE before/after + wall time for each. Mirrors what GTSAM's
direct sparse solve does for the reference (pose_graph.cpp:147-171).

Usage: PYTHONPATH=. python tools/profile_pose_graph.py [--poses 4500]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def build_graph(n_poses: int, n_loops: int, seed: int = 0):
    """Returns (gt (n,4,4) f64, odometry rels with noise, loop pairs)."""
    rng = np.random.default_rng(seed)
    # circular route, ~1.2 m/frame, final 1/8 revisits the start
    lap = max(n_poses - n_poses // 8, 30)
    ang = 2.0 * np.pi * np.arange(n_poses) / lap
    half = lap * 1.2 / (2.0 * np.pi)
    gt = np.zeros((n_poses, 4, 4))
    for i in range(n_poses):
        c, s = np.cos(ang[i] + np.pi / 2), np.sin(ang[i] + np.pi / 2)
        gt[i] = np.eye(4)
        gt[i][:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        gt[i][:3, 3] = [half * np.cos(ang[i]), half * np.sin(ang[i]), 1.8]

    def noise_T(rot_s, trans_s):
        w = rng.normal(0, rot_s, 3)
        t = rng.normal(0, trans_s, 3)
        th = np.linalg.norm(w)
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        R = np.eye(3) + (np.sin(th) / th) * K + ((1 - np.cos(th)) / th**2) * K @ K if th > 1e-12 else np.eye(3)
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        return T

    rels = np.zeros((n_poses, 4, 4))
    rels[0] = np.eye(4)
    for i in range(1, n_poses):
        true_rel = np.linalg.inv(gt[i - 1]) @ gt[i]
        rels[i] = true_rel @ noise_T(0.002, 0.02)

    # loops between the revisit tail and the start (near-coincident poses)
    loops = []
    tail0 = lap
    for k in range(n_loops):
        j = tail0 + (k * (n_poses - tail0)) // max(n_loops, 1)
        if j >= n_poses:
            break
        i = int(round((ang[j] % (2 * np.pi)) / (2 * np.pi) * lap)) % lap
        rel = np.linalg.inv(gt[i]) @ gt[j] @ noise_T(0.0005, 0.005)
        loops.append((i, j, rel))
    return gt, rels, loops


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=4500)
    ap.add_argument("--cap", type=int, default=4608)
    ap.add_argument("--loops", type=int, default=20)
    # loop CAPACITY (the engine runs 512 with ~150 accepted — the gap is
    # what compact_loops removes)
    ap.add_argument("--loop-cap", type=int, default=0)
    ap.add_argument("--dd", default="direct", choices=["direct", "pcg"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lidar_slam_tpu.config import PoseGraphConfig
    from lidar_slam_tpu.models import pose_graph as pg
    from lidar_slam_tpu.utils.metrics import ate_rmse

    print(f"backend: {jax.default_backend()}")
    n, cap = args.poses, args.cap
    gt, rels, loops = build_graph(n, args.loops)

    # chain the noisy odometry -> drifted initial estimates
    chain = np.zeros((n, 4, 4), np.float64)
    chain[0] = np.eye(4)
    for i in range(1, n):
        chain[i] = chain[i - 1] @ rels[i]
    ate0 = ate_rmse(chain.astype(np.float32), gt.astype(np.float32))
    print(f"poses={n} loops={len(loops)} chained-odometry ATE {ate0:.3f} m")

    st = pg.init_state(cap, args.loop_cap or max(len(loops), 1))
    poses_f = np.tile(np.eye(4, dtype=np.float32), (cap, 1, 1))
    poses_f[:n] = chain.astype(np.float32)
    odom_rel = np.tile(np.eye(4, dtype=np.float32), (cap, 1, 1))
    odom_rel[1:n] = rels[1:n].astype(np.float32)
    odom_valid = np.zeros(cap, bool)
    odom_valid[1:n] = True
    st = st._replace(
        poses=jnp.asarray(poses_f),
        n_poses=jnp.int32(n),
        odom_rel=jnp.asarray(odom_rel),
        odom_valid=jnp.asarray(odom_valid),
    )
    for i, j, rel in loops:
        st = pg.add_loop(st, jnp.int32(i), jnp.int32(j), jnp.asarray(rel, jnp.float32))

    # host-chunked: bounded LM per dispatch (an unbounded full-scale first
    # correction runs minutes inside one program and the tunneled TPU runtime
    # kills the worker as hung)
    cfg = PoseGraphConfig(dd_solve=args.dd)
    t0 = time.perf_counter()
    res = pg.optimize_chunked(st, cfg, chunk=cfg.inline_max_iterations)
    np.asarray(res.poses)
    print(f"cold optimize compile+run: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    res = pg.optimize_chunked(st, cfg, chunk=cfg.inline_max_iterations)
    np.asarray(res.final_error)
    cold = time.perf_counter() - t0
    ate1 = ate_rmse(np.asarray(res.poses[:n]), gt.astype(np.float32))
    print(
        f"cold: {cold * 1e3:.0f} ms, {int(res.iterations)} LM iters, "
        f"converged={bool(res.converged)}, error {float(res.final_error):.3e}, "
        f"ATE {ate0:.3f} -> {ate1:.3f} m ({ate0 / max(ate1, 1e-9):.1f}x)"
    )

    # warm restart (the engine's steady-state optimize after a new loop)
    st_warm = st._replace(poses=res.poses)
    t0 = time.perf_counter()
    res2 = pg.optimize_chunked(st_warm, cfg, chunk=cfg.inline_max_iterations)
    np.asarray(res2.final_error)
    warm = time.perf_counter() - t0
    print(
        f"warm: {warm * 1e3:.0f} ms, {int(res2.iterations)} LM iters, "
        f"error {float(res2.final_error):.3e}"
    )
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
