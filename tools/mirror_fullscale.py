#!/usr/bin/env python
"""Full-scale reference-mirror accuracy anchor (VERDICT r3 item 3).

Runs the f64 NumPy/SciPy reference mirror (tools/reference_mirror.py — the
line-by-line reproduction of the C++ odometry math, icp.hpp:157-258 at
reference settings: 50 iters, tol 1e-6, identity init, exact KD-tree) over
the SAME 4,500-frame prepared dataset the flagship bench consumes
(/tmp/lidar_bench_prep_*.npz: host-voxelized 32k clouds), so the bench's
headline ATE finally has a reference-behavior baseline at the scale it is
claimed at (north-star criterion: engine ATE <= 1.05x the reference's,
BASELINE.json; reference validation bar: /root/reference/README.md:259-266).

Both pipelines consume the identical voxel-downsampled clouds (the engine's
C++ host voxelizer output), so the comparison isolates odometry + backend
math, not downsampling details. voxel_size=0 disables the mirror's own
downsample accordingly.

Single-core friendly: checkpoints every --ckpt-every frames and resumes, so
an interrupted run (round boundary, OOM, reboot) loses at most a few frames.

Phase 2 (--loops engine_loops.npz, seconds): applies pose_graph.optimize_host
(the f64 LM / factor model GTSAM runs, pose_graph.cpp:81-171) to the mirror
odometry with the engine's accepted loop constraints — the same
mirror-with-f64-backend full-SLAM stand-in as docs/VALIDATION.md, at full
scale. The loops file is written by `BENCH_SAVE_LOOPS=path python bench.py`.

Usage:
  PYTHONPATH=. python tools/mirror_fullscale.py            # odometry (hours)
  PYTHONPATH=. python tools/mirror_fullscale.py --loops /tmp/bench_loops.npz
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ".")

PREP = "/tmp/lidar_bench_prep_f4500_r65536_d32768_v0.5_hv1_hn1.npz"
CKPT = "/tmp/mirror_fullscale_ckpt.npz"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prep", default=PREP)
    ap.add_argument("--ckpt", default=CKPT)
    ap.add_argument("--ckpt-every", type=int, default=25)
    ap.add_argument("--frames", type=int, default=0, help="0 = all")
    ap.add_argument("--loops", default="", help="engine loops npz (phase 2)")
    args = ap.parse_args()

    from reference_mirror import icp_point_to_plane

    from lidar_slam_tpu.utils.dataset import generate_trajectory, route_half_for
    from lidar_slam_tpu.utils.metrics import ate_rmse, rpe

    z = np.load(args.prep)
    scans = z["scans"]          # (F, 32768, 3) f32, counts all == capacity
    counts = z["counts"]
    F = args.frames or len(scans)
    gt = generate_trajectory(F, half=route_half_for(len(scans)))

    # --- phase 1: f64 mirror odometry (resumable) --------------------------
    poses = np.tile(np.eye(4), (F, 1, 1))
    errs = np.zeros(F)
    iters = np.zeros(F, np.int32)
    start = 1
    if os.path.exists(args.ckpt):
        c = np.load(args.ckpt)
        done = int(c["done"])
        poses[:done] = c["poses"][:done]
        errs[:done] = c["errs"][:done]
        iters[:done] = c["iters"][:done]
        start = done
        print(f"resuming from checkpoint: {done}/{F} frames", flush=True)

    if start < F and not args.loops:
        t0 = time.perf_counter()
        for i in range(start, F):
            src = scans[i, : counts[i]].astype(np.float64)
            tgt = scans[i - 1, : counts[i - 1]].astype(np.float64)
            T, converged, err, nit = icp_point_to_plane(
                src, tgt, max_iterations=50, tolerance=1e-6
            )
            # reference divergence fallback (slam_node.cpp:118-151 semantics
            # via reference_mirror.run_odometry)
            delta = T if (converged and err <= 1.0) else np.eye(4)
            poses[i] = poses[i - 1] @ delta
            errs[i], iters[i] = err, nit
            if i % args.ckpt_every == 0 or i == F - 1:
                tmp = args.ckpt + ".tmp.npz"
                np.savez(tmp, done=i + 1, poses=poses, errs=errs, iters=iters)
                os.replace(tmp, args.ckpt)
                el = time.perf_counter() - t0
                rate = (i - start + 1) / el
                eta = (F - 1 - i) / max(rate, 1e-9)
                print(
                    f"frame {i}/{F}  err={errs[i]:.2e} it={iters[i]} "
                    f"| {rate:.2f} fr/s, ETA {eta / 60:.0f} min",
                    flush=True,
                )

    if os.path.exists(args.ckpt):
        done = int(np.load(args.ckpt)["done"])
    elif args.loops:
        # --loops with no odometry checkpoint would run phase 2 on the
        # all-identity poses array and record a bogus anchor — refuse.
        print(
            f"error: --loops requires a COMPLETED odometry checkpoint at "
            f"{args.ckpt}; run phase 1 (no --loops) first",
            flush=True,
        )
        return 1
    else:
        done = F  # phase 1 just ran to completion in this invocation
    if done < F:
        print(f"odometry incomplete ({done}/{F}); rerun to resume")
        return 1

    mirror_ate = ate_rmse(poses.astype(np.float32), gt)
    t_err, r_err = rpe(poses.astype(np.float32), gt)
    print(
        f"mirror odometry (f64, reference settings): ATE {mirror_ate:.3f} m, "
        f"RPE {t_err:.4f} m / {r_err:.5f} rad, "
        f"mean iters {iters[1:].mean():.1f}",
        flush=True,
    )

    # --- phase 2: + f64 host backend with the engine's loop constraints ----
    if args.loops:
        import jax.numpy as jnp

        from lidar_slam_tpu.models import pose_graph as pg
        from lidar_slam_tpu.config import SlamConfig

        lz = np.load(args.loops)
        lval = lz["loop_valid"]
        odom_rel = np.einsum(
            "nij,njk->nik", np.linalg.inv(poses[:-1]), poses[1:]
        )
        mstate = pg.PoseGraphState(
            poses=jnp.asarray(poses, jnp.float32),
            n_poses=jnp.int32(F),
            odom_rel=jnp.asarray(
                np.concatenate([np.eye(4)[None], odom_rel], 0), jnp.float32
            ),
            odom_valid=jnp.asarray(np.arange(F) >= 1),
            odom_scale=jnp.asarray(1.0 + 10.0 * errs, jnp.float32),
            loop_from=jnp.asarray(lz["loop_from"]),
            loop_to=jnp.asarray(lz["loop_to"]),
            loop_rel=jnp.asarray(lz["loop_rel"], jnp.float32),
            loop_valid=jnp.asarray(lval),
            n_loops=jnp.int32(int(lval.sum())),
            n_loops_dropped=jnp.int32(0),
        )
        t0 = time.perf_counter()
        mres = pg.optimize_host(mstate, SlamConfig().pg)
        full = np.asarray(mres.poses)
        full_ate = ate_rmse(full.astype(np.float32), gt)
        ft, fr = rpe(full.astype(np.float32), gt)
        print(
            f"mirror + f64 backend full SLAM ({int(lval.sum())} loops): "
            f"ATE {full_ate:.3f} m, RPE {ft:.4f} m / {fr:.5f} rad "
            f"({time.perf_counter() - t0:.1f}s, {int(mres.iterations)} LM "
            f"iters, conv={bool(mres.converged)})",
            flush=True,
        )
        out = args.ckpt.replace("ckpt", "result")
        np.savez(
            out, mirror_odo_ate=mirror_ate, mirror_full_ate=full_ate,
            mirror_poses=poses, mirror_full_poses=full,
        )
        print(f"result -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
