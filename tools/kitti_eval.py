#!/usr/bin/env python
"""One-command KITTI odometry evaluation: run the engine on a real sequence,
score ATE/RPE against the published ground truth.

The reference validates on KITTI seq 00 (`/root/reference/README.md:259-266`)
but publishes no numbers; this harness produces them reproducibly for any
mounted sequence:

    python tools/kitti_eval.py --sequence /data/kitti/sequences/00 \
        [--poses /data/kitti/poses/00.txt] [--frames N] [--out docs/KITTI.md]

Expected layout (standard KITTI odometry benchmark):
    <sequence>/velodyne/000000.bin ...   (Nx4 f32: x y z intensity)
    <sequence>/calib.txt                 (Tr: velodyne -> cam0)
    --poses: ground-truth cam0 poses (Nx12 row-major [R|t]); defaults to
    <sequence>/poses.txt, then ../../poses/<seqname>.txt.

Ground truth is mapped into the velodyne frame via Tr (T_velo = Tr^-1 T_cam
Tr) so trajectories compare in the sensor frame the engine estimates in;
ATE uses Umeyama alignment so any residual rigid offset cancels.

Exits with a clear message when the dataset is not mounted (this image
cannot download KITTI — acknowledged in docs/VALIDATION.md; the ring-LiDAR
simulator there is the reproducible stand-in).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

import numpy as np


def load_calib_tr(path: str) -> np.ndarray | None:
    """Tr from calib.txt as a 4x4 (velodyne -> cam0)."""
    if not os.path.exists(path):
        return None
    with open(path) as f:
        for line in f:
            if line.startswith("Tr"):
                vals = np.array(line.split(":", 1)[1].split(), np.float64)
                T = np.eye(4)
                T[:3] = vals.reshape(3, 4)
                return T
    return None


def load_poses(path: str) -> np.ndarray:
    """KITTI pose file: one row-major 3x4 [R|t] per line -> (N, 4, 4)."""
    rows = np.loadtxt(path)
    if rows.ndim == 1:
        rows = rows[None]
    out = np.tile(np.eye(4), (len(rows), 1, 1))
    out[:, :3, :4] = rows.reshape(-1, 3, 4)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sequence", required=True,
                    help="path to sequences/<NN> (contains velodyne/)")
    ap.add_argument("--poses", default=None,
                    help="ground-truth pose file (default: auto-discover)")
    ap.add_argument("--frames", type=int, default=0, help="0 = all")
    ap.add_argument("--max-points", type=int, default=32768)
    ap.add_argument("--voxel", type=float, default=0.5)
    ap.add_argument("--sample", type=int, default=None,
                    help="ICP source subsample (0 = full density; "
                    "default: mode's — fast 4096, fidelity 0)")
    ap.add_argument("--tol", type=float, default=None,
                    help="ICP tolerance (default: mode's — fast 3e-4, "
                    "fidelity 1e-6)")
    ap.add_argument("--iters", type=int, default=None,
                    help="ICP iteration budget (default: mode's — fast 20, "
                    "fidelity 50)")
    ap.add_argument("--knn", default="auto")
    ap.add_argument(
        "--fidelity", action="store_true",
        help="run the REFERENCE's exact runtime settings (full-density "
        "source, tol 1e-6, 50 iterations, identity init, exact 1-NN, "
        "optimize-on-find — types.hpp:143-148, icp.hpp:174, "
        "slam_node.cpp:112-115) instead of the benchmarked fast "
        "configuration; this is the setting reference comparisons should "
        "be quoted at",
    )
    ap.add_argument("--out", default=None,
                    help="append the result row to this markdown file")
    args = ap.parse_args()
    if args.fidelity:
        sample = 0 if args.sample is None else args.sample
        tol = 1e-6 if args.tol is None else args.tol
        iters = 50 if args.iters is None else args.iters
        warm, midrun, vcoarse = False, True, 0
    else:
        sample = 4096 if args.sample is None else args.sample
        tol = 3e-4 if args.tol is None else args.tol
        iters = 20 if args.iters is None else args.iters
        warm, midrun, vcoarse = True, False, 3

    velo_dir = os.path.join(args.sequence, "velodyne")
    bins = sorted(glob.glob(os.path.join(velo_dir, "*.bin")))
    if not bins:
        print(
            f"KITTI dataset not present: no .bin scans under {velo_dir}.\n"
            "Mount the KITTI odometry benchmark and point --sequence at "
            "sequences/<NN>. (This image cannot download KITTI; see "
            "docs/VALIDATION.md for the reproducible ring-LiDAR stand-in.)"
        )
        return 2

    poses_path = args.poses
    if poses_path is None:
        seq_name = os.path.basename(os.path.normpath(args.sequence))
        for cand in (
            os.path.join(args.sequence, "poses.txt"),
            os.path.join(args.sequence, "..", "..", "poses",
                         f"{seq_name}.txt"),
        ):
            if os.path.exists(cand):
                poses_path = cand
                break
    if poses_path is None or not os.path.exists(poses_path):
        print("ground-truth poses not found (tried <sequence>/poses.txt and "
              "../../poses/<NN>.txt); pass --poses explicitly")
        return 2

    n = len(bins) if args.frames <= 0 else min(args.frames, len(bins))
    bins = bins[:n]

    gt_cam = load_poses(poses_path)[:n]
    Tr = load_calib_tr(os.path.join(args.sequence, "calib.txt"))
    if Tr is not None:
        Tr_inv = np.linalg.inv(Tr)
        gt = np.einsum("ij,njk,kl->nil", Tr_inv, gt_cam, Tr)
    else:
        print("calib.txt missing Tr — scoring in cam0 frame (Umeyama "
              "alignment absorbs the constant sensor offset)")
        gt = gt_cam

    from lidar_slam_tpu.config import ICPConfig, LoopClosureConfig, SlamConfig
    from lidar_slam_tpu.models.pipeline import SlamEngine
    from lidar_slam_tpu.utils.io import load_bin
    from lidar_slam_tpu.utils.metrics import ate_rmse, rpe
    from lidar_slam_tpu.utils.native import voxel_downsample_host

    print(f"loading + voxelizing {n} scans from {velo_dir}...")
    t0 = time.perf_counter()
    prepared = []
    for i, p in enumerate(bins):
        s = load_bin(p)
        prepared.append(voxel_downsample_host(s, args.voxel, args.max_points))
        if i % 500 == 499:
            print(f"  {i + 1}/{n}")
    print(f"  host prep {time.perf_counter() - t0:.0f}s")

    cfg = SlamConfig(
        max_raw_points=131072,
        max_points=args.max_points,
        max_frames=n + 8,
        host_voxelize=True,
        dispatch_block=10,
        voxel_size=args.voxel,
        icp=ICPConfig(sample_points=sample, tolerance=tol,
                      max_iterations=iters, warm_start=warm),
        lc=LoopClosureConfig(
            verify_sample=0 if args.fidelity else 4096,
            verify_tolerance=tol,
            verify_coarse_iterations=vcoarse,
            # keep the three 'fast' configurations identical (bench.py
            # defaults / CLI --mode fast): yaw-seeded verify init; fidelity
            # pins the reference's identity init (loop_closure.hpp:105-109)
            yaw_seed=not args.fidelity,
            verify_coarse_reject=0.0 if args.fidelity else 0.6,
        ),
        knn_backend=args.knn,
        optimize_midrun=midrun,
        normal_probe_stride=1 if args.fidelity else 2,
    )
    eng = SlamEngine(cfg)
    eng.preload(prepared)

    print("running engine (warmup compiles on first frames)...")
    t0 = time.perf_counter()
    eng.run_preloaded()
    eng.finalize()
    np.asarray(eng.state.n_poses)
    wall = time.perf_counter() - t0

    traj = eng.trajectory()
    m = eng.metrics()
    ate = ate_rmse(traj, gt)
    t_err, r_err = rpe(traj, gt)
    sps = n / wall
    print(
        f"\nKITTI {os.path.basename(os.path.normpath(args.sequence))}: "
        f"{n} scans in {wall:.1f}s ({sps:.1f} scans/s)\n"
        f"ATE RMSE {ate:.3f} m | RPE {t_err:.4f} m / {r_err:.5f} rad | "
        f"loops {m['loop_count']} (dropped {m['loops_dropped']}) | "
        f"occ_dropped {m['occ_dropped']}"
    )
    if args.out:
        row = (
            f"| KITTI {os.path.basename(os.path.normpath(args.sequence))} "
            f"({n} frames) | {ate:.3f} | {t_err:.4f} | {r_err:.5f} | "
            f"{sps:.1f} |\n"
        )
        with open(args.out, "a") as f:
            f.write(row)
        print(f"appended row to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
