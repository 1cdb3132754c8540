#!/usr/bin/env python
"""In-graph per-stage timing at bench settings (amortized fori_loop harness).

Each stage runs N times inside ONE jitted fori_loop with a data dependency,
so per-dispatch/tunnel overhead (~30 ms/invocation on axon) amortizes away
and the number is pure device time — the honest cost of the stage inside
the block-step program. Uses two consecutive rendered scans so ICP
converges like the bench (warm-start regime), not like random noise.

Usage: python tools/profile_stages.py [--ds 32768] [--sample 4096] [--n 200]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ds", type=int, default=32768)
    ap.add_argument("--sample", type=int, default=4096)
    ap.add_argument("--fcap", type=int, default=4608)
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--knn", default="slab_pallas")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lidar_slam_tpu.config import ICPConfig, LoopClosureConfig, SlamConfig
    from lidar_slam_tpu.models import loop_closure as lc
    from lidar_slam_tpu.models import pipeline as pipe
    from lidar_slam_tpu.models import pose_graph as pg
    from lidar_slam_tpu.ops import se3
    from lidar_slam_tpu.ops.icp import icp_point_to_plane
    from lidar_slam_tpu.ops.occupancy import update_occupancy
    from lidar_slam_tpu.types import PointCloud
    from lidar_slam_tpu.utils.dataset import (
        ScanRenderer, generate_trajectory, generate_world, route_half_for,
    )
    from lidar_slam_tpu.utils.native import voxel_downsample_host

    print(f"backend: {jax.default_backend()}")
    N = args.n
    DS = args.ds
    half = route_half_for(600)
    world = generate_world(0, route_half=half, corridor=60.0)
    gt = generate_trajectory(600, half=half)
    renderer = ScanRenderer(world)
    rng = np.random.default_rng(0)

    cfg = SlamConfig(
        max_raw_points=65536, max_points=DS, max_frames=args.fcap,
        host_voxelize=True, dispatch_block=10,
        icp=ICPConfig(sample_points=args.sample, tolerance=3e-4,
                      max_iterations=20, warm_start=True),
        lc=LoopClosureConfig(verify_sample=4096, verify_tolerance=3e-4),
        knn_backend=args.knn,
    )

    def prep(i):
        s = renderer.render(gt[i], rng, max_points=65536)
        s = voxel_downsample_host(s, cfg.voxel_size, DS)
        buf = np.zeros((DS, 3), np.float32)
        m = min(len(s), DS)
        buf[:m] = s[:m]
        return jnp.asarray(buf), jnp.int32(m)

    (a_pts, a_cnt), (b_pts, b_cnt) = prep(100), prep(101)
    A = PointCloud(a_pts, jnp.arange(DS) < a_cnt)
    B = PointCloud(b_pts, jnp.arange(DS) < b_cnt)
    nrm_fn = pipe._normals_fn(cfg)
    nn1_fn = pipe._resolve_nn1(cfg)
    normals_A = nrm_fn(A.points, A.mask)
    state = pipe.init_state(cfg)
    pose = jnp.eye(4)

    def bench(name, inner):
        @jax.jit
        def loop(x0):
            def body(i, x):
                return x + 0.0 * inner(x)
            return jax.lax.fori_loop(0, N, body, x0)
        x0 = jnp.zeros((8, 8), jnp.float32)
        r = loop(x0); np.asarray(r[0, 0])
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            r = loop(x0); np.asarray(r[0, 0])
            best = min(best, (time.perf_counter() - t0 - 0.03) / N * 1e3)
        print(f"  {name:28s}: {best:7.3f} ms")
        return best

    j = (slice(0, 8), slice(0, 8))

    def icp_stage(x):
        res = icp_point_to_plane(
            B, A, normals_A, cfg.icp,
            init_transform=jnp.eye(4) + 0.0 * x[0, 0], nn1_fn=nn1_fn,
        )
        return res.transformation[:2, :2].sum() + res.final_error

    def normals_stage(x):
        n = nrm_fn(B.points + 0.0 * x[0, 0], B.mask)
        return n[:8, :3].sum()

    def sc_db_stage(x):
        db = lc.add_frame(
            state.db, PointCloud(B.points + 0.0 * x[0, 0], B.mask),
            jnp.int32(7), cfg.sc, enabled=True, normals=normals_A,
        )
        return db.desc[7].sum()

    def occ_stage(x):
        world_pts = se3.apply(pose, B.points) + 0.0 * x[0, 0]
        g, nd = update_occupancy(
            state.grid, world_pts, B.mask, pose[:2, 3], cfg.grid
        )
        return g[:8, :8].astype(jnp.float32).sum() + nd.astype(jnp.float32)

    def odom_stage(x):
        st = pg.add_odometry(
            state.pg, jnp.int32(7), pose + 0.0 * x[0, 0], jnp.float32(0.1),
            valid=jnp.bool_(True),
        )
        return st.odom_rel[7, :2, :2].sum()

    bench("icp (warm-start regime)", icp_stage)
    bench("normals (adaptive)", normals_stage)
    bench("scan-context + db write", sc_db_stage)
    bench("occupancy patch", occ_stage)
    bench("pg.add_odometry", odom_stage)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
