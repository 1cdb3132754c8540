#!/usr/bin/env python
"""Loop-closure recall of the ring-key prefilter vs the full SC search.

VERDICT item 7: the full 60-shift descriptor matmul against the whole DB is
the detect-cost driver at a 4,608-frame DB; the reference's (dead) ring_key
API (scan_context.hpp:107-109) is resurrected as a top-k prefilter
(`LoopClosureConfig.ring_key_prefilter`). This tool measures what the
prefilter COSTS in recall: run the full pipeline on a loop-bearing synthetic
route at prefilter k in {0, 128, 256} and compare the accepted loop sets and
final ATE. (The detect-COST side of the trade lives in
tools/profile_detect.py on real TPU hardware.)

CPU-safe: pass --cpu (recall is hardware-independent).

Usage: PYTHONPATH=. python tools/measure_prefilter_recall.py \
         [--frames 600] [--points 8192] [--ds 4096] [--cpu]
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=600)
    ap.add_argument("--points", type=int, default=8192)
    ap.add_argument("--ds", type=int, default=4096)
    ap.add_argument("--ks", type=int, nargs="*", default=[0, 128, 256])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from lidar_slam_tpu.config import ICPConfig, LoopClosureConfig, SlamConfig
    from lidar_slam_tpu.models.pipeline import SlamEngine
    from lidar_slam_tpu.utils.dataset import (
        ScanRenderer,
        generate_trajectory,
        generate_world,
        route_half_for,
    )
    from lidar_slam_tpu.utils.metrics import ate_rmse
    from lidar_slam_tpu.utils.native import voxel_downsample_host

    half = route_half_for(args.frames)
    world = generate_world(0, route_half=half, corridor=60.0)
    gt = generate_trajectory(args.frames, half=half)
    renderer = ScanRenderer(world)
    rng = np.random.default_rng(0)
    prepared = []
    for i in range(args.frames):
        s = renderer.render(gt[i], rng, max_points=args.points)
        prepared.append(voxel_downsample_host(s, 0.5, args.ds))
    print(f"dataset: {args.frames} frames, route half {half:.0f} m",
          flush=True)

    results = {}
    for k in args.ks:
        cfg = SlamConfig(
            max_raw_points=args.points,
            max_points=args.ds,
            max_frames=args.frames + 8,
            host_voxelize=True,
            dispatch_block=10,
            icp=ICPConfig(sample_points=2048, tolerance=3e-4,
                          max_iterations=20, warm_start=True),
            lc=LoopClosureConfig(verify_sample=2048,
                                 verify_tolerance=3e-4,
                                 ring_key_prefilter=k),
        )
        eng = SlamEngine(cfg)
        for ds in prepared:
            eng.push_scan(ds)
        eng.finalize()
        lf = np.asarray(eng.state.pg.loop_from)
        lt = np.asarray(eng.state.pg.loop_to)
        lv = np.asarray(eng.state.pg.loop_valid)
        loops = set(zip(lf[lv].tolist(), lt[lv].tolist()))
        ate = ate_rmse(eng.trajectory(), gt)
        results[k] = (loops, ate)
        print(f"prefilter k={k:4d}: {len(loops)} loops accepted, "
              f"ATE {ate:.3f} m", flush=True)

    base_loops, base_ate = results[args.ks[0]]
    for k in args.ks[1:]:
        loops, ate = results[k]
        missed = base_loops - loops
        extra = loops - base_loops
        recall = (1.0 - len(missed) / max(len(base_loops), 1))
        print(f"k={k}: recall {recall:.3f} vs full search "
              f"({len(missed)} missed, {len(extra)} extra), "
              f"ATE delta {ate - base_ate:+.3f} m", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
