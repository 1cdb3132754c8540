#!/usr/bin/env python
"""Direct per-phase attribution of the full pipeline at bench shapes.

Drives the engine's jitted fns over real rendered scans with a hard sync
after EVERY dispatch, accumulating wall time per phase (block-step, detect,
verify-bearing detect, in-graph optimize). Syncs inflate absolute numbers
(~9 ms RPC each) but the RELATIVE attribution is exact — differential
benchmarking on the shared tunnel is +-20% noise and cannot rank levers.

Usage: python tools/profile_phases.py [--frames 600] [--ds 32768] [--fcap 4608]
"""

from __future__ import annotations

import argparse
import time
from collections import defaultdict

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=600)
    ap.add_argument("--fcap", type=int, default=4608, help="state frame capacity")
    ap.add_argument("--ds", type=int, default=32768)
    ap.add_argument("--sample", type=int, default=4096)
    ap.add_argument("--lc", type=int, default=0)
    ap.add_argument("--block", type=int, default=10)
    ap.add_argument("--knn", default="auto")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lidar_slam_tpu.config import ICPConfig, LoopClosureConfig, SlamConfig
    from lidar_slam_tpu.models import pipeline as pipe
    from lidar_slam_tpu.utils.dataset import (
        ScanRenderer, generate_trajectory, generate_world, route_half_for,
    )
    from lidar_slam_tpu.utils.native import voxel_downsample_host

    print(f"backend: {jax.default_backend()}")
    n = args.frames
    half = route_half_for(n)
    world = generate_world(0, route_half=half, corridor=60.0)
    gt = generate_trajectory(n, half=half)
    renderer = ScanRenderer(world)
    rng = np.random.default_rng(0)

    cfg = SlamConfig(
        max_raw_points=65536,
        max_points=args.ds,
        lc_cloud_points=args.lc,
        max_frames=args.fcap,
        host_voxelize=True,
        dispatch_block=args.block,
        icp=ICPConfig(sample_points=args.sample, tolerance=1e-4,
                      max_iterations=20, warm_start=True),
        lc=LoopClosureConfig(verify_sample=4096, verify_tolerance=1e-4),
        knn_backend=args.knn,
    )
    print(f"config: F={args.fcap} ds={args.ds} sample={args.sample} "
          f"lc={cfg.lc_points} block={args.block}")

    scans = []
    for i in range(n):
        s = renderer.render(gt[i], rng, max_points=65536)
        s = voxel_downsample_host(s, cfg.voxel_size, args.ds)
        buf = np.zeros((args.ds, 3), np.float32)
        m = min(len(s), args.ds)
        buf[:m] = s[:m]
        scans.append((buf, np.int32(m)))
    print(f"prepared {n} scans")

    state = pipe.init_state(cfg)
    init_fn = pipe.make_init_fn(cfg)
    block_fn = pipe.make_block_step_fn(cfg, args.block)
    loop_fn = pipe.make_loop_fn(cfg)

    def sync(st):
        np.asarray(st.n_poses)

    t0 = time.perf_counter()
    state = init_fn(state, jnp.asarray(scans[0][0]), jnp.int32(scans[0][1]))
    sync(state)
    print(f"init compile: {time.perf_counter() - t0:.1f}s")

    phases = defaultdict(float)
    counts = defaultdict(int)
    B = args.block
    f = 1
    compile_done = False
    while f + B <= n:
        raws = jnp.asarray(np.stack([scans[f + k][0] for k in range(B)]))
        cnts = jnp.asarray(np.stack([scans[f + k][1] for k in range(B)]))
        t0 = time.perf_counter()
        state = block_fn(state, raws, cnts, jnp.int32(f))
        sync(state)
        dt = time.perf_counter() - t0
        label = "block_step" if compile_done else "block_step_compile"
        phases[label] += dt
        counts[label] += 1
        f += B
        last = f - 1
        if last % cfg.loop_check_every == 0 and last > cfg.loop_start_frame:
            t0 = time.perf_counter()
            state, det = loop_fn(state, jnp.int32(last))
            nacc = int(np.asarray(det.accepted).sum())
            ncand = int(np.isfinite(np.asarray(det.sc_distance)).sum())
            dt = time.perf_counter() - t0
            if counts["detect_none"] + counts["detect_cand"] + counts[
                "detect_hit"] + counts["detect_compile"] == 0:
                label = "detect_compile"  # first call pays the trace+compile
            elif nacc > 0:
                label = "detect_hit"       # verify + in-graph optimize ran
            elif ncand > 0:
                label = "detect_cand"      # verify ran, nothing accepted
            else:
                label = "detect_none"
            phases[label] += dt
            counts[label] += 1
        if not compile_done and counts["block_step"] == 0 and counts[
            "block_step_compile"] >= 1:
            compile_done = True

    total = sum(phases.values())
    print(f"\nframes processed: {f}; total attributed {total:.1f}s")
    for k in sorted(phases):
        c = counts[k]
        print(f"  {k:20s}: {phases[k]:7.2f}s  ({c:4d} calls, "
              f"{phases[k] / max(c, 1) * 1e3:7.1f} ms/call)")
    per_frame = (
        phases["block_step"] / max(counts["block_step"] * B, 1) * 1e3
    )
    print(f"\nblock step: {per_frame:.2f} ms/frame (incl. one sync per block)")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
