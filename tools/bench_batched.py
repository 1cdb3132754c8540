#!/usr/bin/env python
"""Ladder #4: batched multi-sequence (DP) throughput vs the single engine.

Runs the same K synthetic sequences through BatchedSlamEngine (one vmapped
program, block dispatch) and one of them through SlamEngine, reporting
aggregate and per-sequence scans/s. Pass criterion (BASELINE ladder #4):
batched AGGREGATE >= single-engine throughput (the batch shares one chip;
vmapped kernels are compute-bound, so the win is dispatch amortization).

Usage: python tools/bench_batched.py [--frames 600] [--batch 4]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=600)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--ds", type=int, default=16384)
    args = ap.parse_args()

    import jax

    from lidar_slam_tpu.config import ICPConfig, LoopClosureConfig, SlamConfig
    from lidar_slam_tpu.models.pipeline import SlamEngine
    from lidar_slam_tpu.parallel import BatchedSlamEngine
    from lidar_slam_tpu.utils.dataset import (
        ScanRenderer, generate_trajectory, generate_world, route_half_for,
    )
    from lidar_slam_tpu.utils.metrics import ate_rmse
    from lidar_slam_tpu.utils.native import voxel_downsample_host

    print(f"backend: {jax.default_backend()}")
    n, B = args.frames, args.batch
    half = route_half_for(n)
    gt = generate_trajectory(n, half=half)
    seqs = []
    for b in range(B):
        world = generate_world(b, route_half=half, corridor=60.0)
        renderer = ScanRenderer(world)
        rng = np.random.default_rng(b)
        seqs.append([
            voxel_downsample_host(
                renderer.render(gt[i], rng, max_points=65536), 0.5, args.ds
            )
            for i in range(n)
        ])
    print(f"prepared {B} x {n} scans")

    cfg = SlamConfig(
        max_raw_points=65536, max_points=args.ds, lc_cloud_points=8192,
        max_frames=n + 8, host_voxelize=True, dispatch_block=10,
        icp=ICPConfig(sample_points=4096, tolerance=3e-4, max_iterations=20,
                      warm_start=True),
        lc=LoopClosureConfig(verify_sample=4096, verify_tolerance=3e-4),
    )

    def run_single():
        eng = SlamEngine(cfg)
        for s in seqs[0]:
            eng.push_scan(s)
        eng.finalize()
        np.asarray(eng.state.n_poses)
        return eng

    def run_batched():
        eng = BatchedSlamEngine(cfg, batch=B, optimize_midrun=False)
        for i in range(n):
            eng.push_scans([seqs[b][i] for b in range(B)])
        eng.finalize()
        np.asarray(eng.state.n_poses)
        return eng

    print("single warmup (compile)...")
    t0 = time.perf_counter()
    eng1 = run_single()
    print(f"  {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    eng1 = run_single()
    w1 = time.perf_counter() - t0
    ate1 = ate_rmse(eng1.trajectory(), gt)
    print(f"single: {w1:.1f}s = {n / w1:.1f} scans/s, ATE {ate1:.3f} m")

    print("batched warmup (compile)...")
    t0 = time.perf_counter()
    engB = run_batched()
    print(f"  {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    engB = run_batched()
    wB = time.perf_counter() - t0
    trajs = engB.trajectories()
    ates = [ate_rmse(trajs[b][:n], gt) for b in range(B)]
    agg = n * B / wB
    print(
        f"batched B={B}: {wB:.1f}s = {agg:.1f} scans/s aggregate "
        f"({agg / B:.1f}/seq), ATEs {[round(a, 2) for a in ates]}"
    )
    print(f"aggregate vs single: {agg / (n / w1):.2f}x "
          f"({'PASS' if agg >= n / w1 else 'FAIL'} ladder #4 criterion)")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
