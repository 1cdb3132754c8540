#!/usr/bin/env python
"""Cost of the loop-closure FIRING paths at full KITTI scale.

tools/profile_detect.py shows the non-firing loop tick costs ~0 over the
4 ms dispatch floor; what remains visible in the full-scale bench is the
cost when a tick actually FIRES: (a) the vmapped 6-candidate verification
ICP (loop_closure.hpp:96-123 semantics) and (b) the in-graph
optimize-on-find LM chunk (slam_node.cpp:112-115 semantics) at loop
CAPACITY (the Woodbury K-Cholesky is (6L)^2 at L = max_loop_factors
regardless of the accepted count — static shapes).

Measures, at F=4608 / N=32768 / L=512:
  1. vmapped verify ICP (6 lanes, 4096-sample source, identity init) on a
     realistic revisit pair (same rendered scene, ~1 m offset + yaw),
  2. one pg.optimize chunk at inline_max_iterations in {1, 3} with ~150
     valid loops on a 4,500-pose chain,
so the full-scale bench budget can be attributed and the
inline-iteration / yaw-seed levers evaluated with numbers.

Usage: PYTHONPATH=".:$PYTHONPATH" python tools/profile_firing.py
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4608)
    ap.add_argument("--ds", type=int, default=32768)
    ap.add_argument("--loops", type=int, default=150)
    ap.add_argument("--lcap", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lidar_slam_tpu.config import ICPConfig, LoopClosureConfig
    from lidar_slam_tpu.models import pose_graph as pg
    from lidar_slam_tpu.ops.icp import icp_point_to_plane
    from lidar_slam_tpu.ops.normals import estimate_normals_adaptive
    from lidar_slam_tpu.types import PointCloud
    from lidar_slam_tpu.utils.dataset import (
        ScanRenderer, generate_world, route_half_for,
    )
    from lidar_slam_tpu.utils.native import voxel_downsample_host

    print(f"backend: {jax.default_backend()}")
    F, N, L = args.frames, args.ds, args.lcap
    lc_cfg = LoopClosureConfig(verify_sample=4096, verify_tolerance=3e-4)

    # --- 1. firing verification: vmapped 6-lane ICP on a realistic revisit
    world = generate_world(0, route_half=route_half_for(600), corridor=60.0)
    renderer = ScanRenderer(world)
    rng = np.random.default_rng(0)

    def scan_at(x, y, yaw):
        T = np.eye(4, dtype=np.float32)
        c, s = np.cos(yaw), np.sin(yaw)
        T[:2, :2] = [[c, -s], [s, c]]
        T[:3, 3] = [x, y, 1.8]
        s_ = renderer.render(T, rng, max_points=65536)
        return voxel_downsample_host(s_, 0.5, N)

    def pad(s):
        p = np.zeros((N, 3), np.float32)
        p[: len(s)] = s
        m = np.zeros((N,), bool)
        m[: len(s)] = True
        return jnp.asarray(p), jnp.asarray(m)

    qp, qm = pad(scan_at(8.0, 0.0, 0.05))
    cands = [scan_at(8.0 + 0.8 * k, 0.4 * k, 0.1 * k) for k in range(3)]
    cp = jnp.stack([pad(c)[0] for c in cands] * 2)  # (6, N, 3)
    cm = jnp.stack([pad(c)[1] for c in cands] * 2)
    cn = jax.vmap(lambda p, m: estimate_normals_adaptive(p, m))(cp, cm)

    icp_cfg = ICPConfig(
        max_iterations=lc_cfg.icp_max_iterations,
        tolerance=lc_cfg.verify_tolerance,
        sample_points=lc_cfg.verify_sample,
    )
    query = PointCloud(qp, qm)

    def make_verify6(nn1_fn):
        @jax.jit
        def verify6(cp, cm, cn, jitter):
            def one(c, m, n):
                res = icp_point_to_plane(
                    query, PointCloud(c, m), n, icp_cfg,
                    jnp.eye(4, dtype=jnp.float32), nn1_fn=nn1_fn,
                )
                return res.converged, res.final_error, res.num_iterations

            return jax.vmap(one)(cp + jitter, cm, cn)

        return verify6

    def timed(label, fn, *a):
        t0 = time.perf_counter()
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        print(f"  {label} compile+first: {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for r in range(args.reps):
            out = fn(*a[:-1], a[-1] + np.float32(r * 1e-4))
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / args.reps * 1e3
        print(f"  {label}: {dt:.2f} ms")
        return out, dt

    backends = [("xla-default", None)]
    try:
        from lidar_slam_tpu.ops.knn_pallas import nn1_pallas, pallas_supported

        if pallas_supported():
            backends.append(("pallas", lambda s, t, m: nn1_pallas(s, t, m)))
    except ImportError:
        pass
    for name, nn in backends:
        out, _ = timed(
            f"verify6/{name} (30-iter cap)", make_verify6(nn),
            cp, cm, cn, jnp.float32(0),
        )
        conv, err, iters = out
        print(f"    lanes converged={np.asarray(conv).tolist()} "
              f"iters={np.asarray(iters).tolist()} "
              f"err={np.round(np.asarray(err), 4).tolist()}")

    # --- 2. in-graph optimize chunk at loop capacity
    pgs = pg.init_state(F, L)
    # drifting odometry chain + plausible loop set in the last 1/8
    rel = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    rel[1:, 0, 3] = 1.2
    rel[1:, 1, 3] = 0.002
    pgs = pgs._replace(
        odom_rel=jnp.asarray(rel),
        odom_valid=jnp.ones((F,), bool).at[0].set(False),
        odom_scale=jnp.ones((F,), jnp.float32) * 1.05,
        n_poses=jnp.int32(F),
    )
    poses_np = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    for i in range(1, F):
        poses_np[i] = poses_np[i - 1] @ rel[i]
    pgs = pgs._replace(poses=jnp.asarray(poses_np))
    nl = args.loops
    lf = np.linspace(F // 8, F - 64, nl).astype(np.int32)
    lt = lf + np.random.default_rng(1).integers(50, 60, nl).astype(np.int32)
    meas = np.tile(np.eye(4, dtype=np.float32), (L, 1, 1))
    pgs = pgs._replace(
        loop_from=jnp.zeros((L,), jnp.int32).at[:nl].set(jnp.asarray(lf)),
        loop_to=jnp.zeros((L,), jnp.int32).at[:nl].set(jnp.asarray(lt)),
        loop_rel=jnp.asarray(meas),
        loop_valid=jnp.zeros((L,), bool).at[:nl].set(True),
        n_loops=jnp.int32(nl),
    )

    for iters_ in (1, 3):
        fn = jax.jit(
            lambda st, lam0, it=iters_: pg.optimize(st, max_iterations=it).poses
        )
        t0 = time.perf_counter()
        np.asarray(fn(pgs, jnp.float32(0)))
        print(f"  inline LM x{iters_} compile+first: {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for r in range(args.reps):
            out = fn(pgs._replace(poses=pgs.poses + r * 1e-6), jnp.float32(r))
        np.asarray(out)
        dt = (time.perf_counter() - t0) / args.reps * 1e3
        print(f"  inline LM x{iters_} at L={L}: {dt:.2f} ms")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
