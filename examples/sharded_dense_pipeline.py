"""BASELINE config ladder #5, END-TO-END: the full SLAM pipeline on dense
128k-point clouds with the ICP correspondence search sharded across a mesh.

Unlike examples/sharded_dense_knn.py (the kernel alone), this runs the whole
per-scan step — voxel pass-through, windowed radius normals, point-to-plane
ICP with the collective target-sharded 1-NN injected via
``make_step_fn(cfg, nn1_fn=...)``, Scan Context, keyframe DB, occupancy —
plus a loop-detection pass, at REAL 131072-point shapes, over an N-device
mesh (virtual CPU devices here; ICI collectives on real hardware).

Run:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/sharded_dense_pipeline.py [--frames 6]
"""

import argparse
import os
import sys
import time

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lidar_slam_tpu.config import ICPConfig, LoopClosureConfig, SlamConfig
from lidar_slam_tpu.models import pipeline as pipe
from lidar_slam_tpu.parallel import make_mesh
from lidar_slam_tpu.parallel.sharded_knn import nn1_target_sharded
from lidar_slam_tpu.utils.dataset import (
    generate_trajectory,
    generate_world,
    render_scan,
    route_half_for,
)
from lidar_slam_tpu.utils.metrics import ate_rmse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--points", type=int, default=131072)
    args = ap.parse_args()

    n_dev = len(jax.devices())
    mesh = make_mesh({"pts": n_dev})
    N = args.points
    print(f"devices: {n_dev}, mesh axes: pts={n_dev}, cloud size {N}")

    # dense scans: fine voxel keeps ~full density (dense 128-beam regime)
    half = route_half_for(60)
    world = generate_world(0, route_half=half, ground_step=0.12)
    gt = generate_trajectory(60, half=half)[: args.frames]
    rng = np.random.default_rng(0)
    scans = [
        render_scan(world, gt[i], rng, max_range=45.0, max_points=N)
        for i in range(args.frames)
    ]
    print(f"scans: {[len(s) for s in scans]}")

    cfg = SlamConfig(
        max_raw_points=N,
        max_points=N,
        lc_cloud_points=16384,   # verification DB subsampled (quirk #9 cap)
        max_frames=16,
        host_voxelize=True,       # dense pass-through (pre-rendered density)
        min_points=1024,
        loop_check_every=args.frames - 1,
        loop_start_frame=1,
        icp=ICPConfig(max_iterations=8, tolerance=1e-4, sample_points=4096,
                      warm_start=True),
        lc=LoopClosureConfig(frame_gap=2, verify_sample=2048,
                             icp_max_iterations=4),
        # 131k dense clouds pack ~3-6k points per 1.2 m x-band: the windowed
        # normal accumulator needs a wider window than the 32k default
        normal_window=8192,
    )

    nn1_fn = lambda s, t, m: nn1_target_sharded(s, t, m, mesh, axis="pts")

    state = pipe.init_state(cfg)
    init_fn = pipe.make_init_fn(cfg)
    step_fn = pipe.make_step_fn(cfg, nn1_fn=nn1_fn)
    loop_fn = pipe.make_loop_fn(cfg)

    def pad(s):
        # host_voxelize=True is the pre-downsampled pass-through path; its
        # contract includes x-major ORDER (every voxelizer emits it; the
        # windowed normal accumulator and slab backends depend on it)
        s = s[np.argsort(s[:, 0], kind="stable")]
        buf = np.zeros((N, 3), np.float32)
        n = min(len(s), N)
        buf[:n] = s[:n]
        return jnp.asarray(buf), jnp.int32(n)

    t0 = time.perf_counter()
    state = init_fn(state, *pad(scans[0]))
    jax.block_until_ready(state.prev.points)
    print(f"init (compile+run): {time.perf_counter() - t0:.1f}s")

    for f in range(1, args.frames):
        t0 = time.perf_counter()
        state = step_fn(state, *pad(scans[f]), jnp.int32(f))
        if f == cfg.loop_check_every and f > cfg.loop_start_frame:
            state, det = loop_fn(state, jnp.int32(f))
        jax.block_until_ready(state.poses)
        print(
            f"frame {f}: {time.perf_counter() - t0:.1f}s "
            f"(icp err {float(state.icp_error[f]):.4f}, "
            f"iters {int(state.icp_iters[f])})"
        )

    n = int(state.n_poses)
    ate = ate_rmse(np.asarray(state.poses[:n]), gt[:n])
    print(f"end-to-end {args.frames} frames at {N} pts: ATE {ate:.3f} m")
    assert ate < 1.0, ate
    print("OK: full pipeline with mesh-sharded kNN at 128k shapes")


if __name__ == "__main__":
    main()
