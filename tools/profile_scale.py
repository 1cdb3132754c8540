#!/usr/bin/env python
"""Profile the per-frame step + detect costs at full-KITTI-scale shapes.

Round-1 finding (commit ac0f0de): at 4,552-frame buffers / 32k clouds the
step took ~83 ms and the detect pass ~49.5 ms, vs ~6 ms / ~3 ms at the
600-frame / 16k bench regime. This harness isolates where that time goes:

- chained dispatch timing (identical dispatches are cached by the tunnel
  runtime -> inputs are varied per call; only a device->host fetch is an
  honest sync; per-op eager timing is meaningless over the tunnel),
- component ablations (ICP only / normals only / DB writes only / occupancy
  only) as separately jitted donated-state functions.

Usage: python tools/profile_scale.py [--frames 4608] [--ds 32768] [--reps 30]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4608)
    ap.add_argument("--ds", type=int, default=32768)
    ap.add_argument("--lc", type=int, default=0, help="DB cloud capacity (0=ds)")
    ap.add_argument("--sample", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--detect-reps", type=int, default=10)
    ap.add_argument("--skip-step", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lidar_slam_tpu.config import ICPConfig, LoopClosureConfig, SlamConfig
    from lidar_slam_tpu.models import pipeline as pipe
    from lidar_slam_tpu.utils.dataset import (
        generate_trajectory, generate_world, render_scan, route_half_for,
    )
    from lidar_slam_tpu.utils.native import voxel_downsample_host

    print(f"backend: {jax.default_backend()}")
    F, DS = args.frames, args.ds

    cfg = SlamConfig(
        max_raw_points=131072,
        max_points=DS,
        lc_cloud_points=args.lc,
        max_frames=F,
        host_voxelize=True,
        icp=ICPConfig(sample_points=args.sample, tolerance=1e-4,
                      max_iterations=20),
        lc=LoopClosureConfig(verify_sample=4096, verify_tolerance=1e-4),
    )
    print(f"config: F={F} ds={DS} lc={cfg.lc_points} sample={args.sample}")

    # A handful of real-ish scans to rotate through (vary inputs per dispatch)
    half = route_half_for(600)
    world = generate_world(0, route_half=half)
    gt = generate_trajectory(600, half=half)
    rng = np.random.default_rng(0)
    n_scans = 8
    scans = []
    for i in range(n_scans):
        s = render_scan(world, gt[i], rng, max_points=65536)
        scans.append(voxel_downsample_host(s, cfg.voxel_size, DS))
    pads = []
    for s in scans:
        buf = np.zeros((DS, 3), np.float32)
        n = min(len(s), DS)
        buf[:n] = s[:n]
        pads.append((jnp.asarray(buf), jnp.int32(n)))

    state = pipe.init_state(cfg)
    init_fn = pipe.make_init_fn(cfg)
    step_fn = pipe.make_step_fn(cfg)
    loop_fn = pipe.make_loop_fn(cfg)

    def sync(st):
        np.asarray(st.n_poses)  # honest sync: device->host fetch

    t0 = time.perf_counter()
    state = init_fn(state, *pads[0])
    sync(state)
    print(f"init compile+run: {time.perf_counter() - t0:.1f}s")

    def timed(label, fn, reps, frame0=1):
        nonlocal state
        # warmup/compile
        t0 = time.perf_counter()
        state = fn(state, 0, frame0)
        sync(state)
        print(f"  {label} compile+first: {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for r in range(reps):
            state = fn(state, (r + 1) % n_scans, frame0 + 1 + r)
        sync(state)
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"  {label}: {dt:.2f} ms/frame  ({reps} reps)")
        return dt

    results = {}
    if not args.skip_step:
        def full_step(st, si, fr):
            return step_fn(st, *pads[si], jnp.int32(fr))

        results["step"] = timed("full step", full_step, args.reps)

    # detect pass at a DB populated to ~90% capacity
    print("populating DB counters (fast-forward writes)...")
    # cheap: write in_db flags directly to emulate a full DB without pushing
    # 4k scans (descriptor contents rotate among the 8 real scans)
    from lidar_slam_tpu.ops.scan_context import scan_context
    descs = []
    for s, (pts, n) in zip(scans, pads):
        mask = jnp.arange(DS) < n
        descs.append(scan_context(pts, mask, cfg.sc))
    descs = jnp.stack(descs)
    reps_f = (F + n_scans - 1) // n_scans
    db = state.db
    full_desc = jnp.tile(descs, (reps_f, 1, 1))[:F]
    norms = jnp.sqrt(jnp.sum(full_desc * full_desc, axis=(1, 2)))
    clouds = jnp.tile(jnp.stack([p for p, _ in pads]), (reps_f, 1, 1))[:F]
    cl = clouds[:, : cfg.lc_points]
    cmask = jnp.tile(
        jnp.stack([jnp.arange(cfg.lc_points) < n for _, n in pads]),
        (reps_f, 1),
    )[:F]
    db = db._replace(
        desc=full_desc,
        desc_norm=norms,
        clouds=cl,
        cloud_mask=cmask,
        normals=jnp.zeros_like(cl).at[:, :, 2].set(1.0),
        in_db=jnp.ones((F,), bool),
        last_frame=jnp.int32(F - 1),
    )
    state = state._replace(db=db, n_poses=jnp.int32(F))
    sync(state)

    def detect_pass(st, si, fr):
        st, _ = loop_fn(st, jnp.int32(F - 1 - (fr % 7)))  # stale -> no verify
        return st

    results["detect_stale"] = timed(
        "detect (no candidates, gated)", detect_pass, args.detect_reps,
        frame0=2,
    )

    def detect_hit(st, si, fr):
        st, _ = loop_fn(st, jnp.int32(F - 1))  # fresh query: full search
        return st

    results["detect_fresh"] = timed(
        "detect (fresh query, search+maybe-verify)", detect_hit,
        args.detect_reps, frame0=2,
    )

    print({k: round(v, 2) for k, v in results.items()})
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
