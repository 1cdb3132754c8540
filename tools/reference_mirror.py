"""Faithful NumPy/SciPy mirror of the reference C++ odometry pipeline.

The north-star accuracy criterion is "ATE RMSE within 5% of the C++
reference" (BASELINE.json), but the reference cannot be built here (no
Eigen/GTSAM/ROS2 in the image). This module reproduces its odometry math
*numerically* — f64 throughout, exact KD-tree queries, the same constants and
control flow — so the TPU engine can be compared against reference behavior
on any dataset. Every stage cites the reference file:line it mirrors.

Scope: frame-to-frame odometry (BASELINE config ladder #1). The GTSAM
backend is intentionally out of scope (binary dependency); loop closure and
pose-graph effects are validated against ground truth instead.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def voxel_downsample(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """file_utils.cpp:148-196 — hash-map centroid per floor(p/voxel) cell."""
    if voxel_size <= 0:
        return points
    keys = np.floor(points.astype(np.float64) / voxel_size).astype(np.int64)
    _, inv = np.unique(keys, axis=0, return_inverse=True)
    n = inv.max() + 1
    sums = np.zeros((n, 3), np.float64)
    np.add.at(sums, inv, points)
    counts = np.bincount(inv, minlength=n).astype(np.float64)
    return sums / counts[:, None]


def estimate_normals(points: np.ndarray, tree: cKDTree, k: int = 20) -> np.ndarray:
    """icp.hpp:23-67 — k-NN covariance, smallest eigenvector, z-oriented."""
    _, idx = tree.query(points, k=k)
    nbr = points[idx]                          # (N, k, 3)
    centroid = nbr.mean(axis=1)
    d = nbr - centroid[:, None, :]
    cov = np.einsum("nki,nkj->nij", d, d) / k
    _, vecs = np.linalg.eigh(cov)              # ascending eigenvalues
    normals = vecs[:, :, 0]
    flip = normals[:, 2] < 0
    normals[flip] = -normals[flip]
    norms = np.linalg.norm(normals, axis=1, keepdims=True)
    return normals / np.maximum(norms, 1e-30)


def _rodrigues(rvec: np.ndarray) -> np.ndarray:
    """icp.hpp:126-141."""
    angle = np.linalg.norm(rvec)
    if angle < 1e-10:
        return np.eye(3)
    axis = rvec / angle
    K = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def solve_point_to_plane(src, tgt, normals):
    """icp.hpp:89-144 — J = [p x n, n], LDLT solve, Rodrigues + raw t."""
    J = np.concatenate([np.cross(src, normals), normals], axis=1)
    b = np.sum((tgt - src) * normals, axis=1)
    x = np.linalg.solve(J.T @ J, J.T @ b)
    T = np.eye(4)
    T[:3, :3] = _rodrigues(x[:3])
    T[:3, 3] = x[3:]
    return T


def icp_point_to_plane(source, target, max_iterations=50, tolerance=1e-6,
                       min_error=1e-9):
    """icp.hpp:157-258 — full reference control flow, f64."""
    tree = cKDTree(target)
    normals = estimate_normals(target, tree, 20)
    cur = source.copy()
    total = np.eye(4)
    prev_err = np.inf
    converged = False
    history = []
    for _ in range(max_iterations):
        _, ind = tree.query(cur)
        q = target[ind]
        n = normals[ind]
        plane = np.sum((q - cur) * n, axis=1)
        err = np.sqrt(np.mean(plane**2))
        history.append(err)
        if err < min_error or abs(prev_err - err) < tolerance:
            converged = True
            break
        delta = solve_point_to_plane(cur, q, n)
        cur = cur @ delta[:3, :3].T + delta[:3, 3]
        total = delta @ total
        prev_err = err
    _, ind = tree.query(cur)
    q = target[ind]
    n = normals[ind]
    final_error = float(np.sqrt(np.mean(np.sum((q - cur) * n, axis=1) ** 2)))
    history.append(final_error)
    return total, converged, final_error, len(history) - 1


def run_odometry(scans, voxel_size=0.5, max_iterations=50, tolerance=1e-6,
                 min_points=1000, divergence_error=1.0, verbose=False):
    """process_frame odometry loop (slam_node.cpp:118-151), poses chained."""
    poses = [np.eye(4)]
    prev = voxel_downsample(scans[0], voxel_size)
    stats = []
    for i, scan in enumerate(scans[1:], start=1):
        curr = voxel_downsample(scan, voxel_size)
        if len(curr) < min_points:
            poses.append(poses[-1].copy())
            prev = curr
            continue
        T, converged, err, iters = icp_point_to_plane(
            curr, prev, max_iterations, tolerance
        )
        delta = T if (converged and err <= divergence_error) else np.eye(4)
        poses.append(poses[-1] @ delta)
        stats.append((err, iters, converged))
        prev = curr
        if verbose and i % 10 == 0:
            print(f"frame {i}: err={err:.3e} iters={iters} conv={converged}")
    return np.stack(poses), stats


def main():
    import argparse
    import sys
    import time

    sys.path.insert(0, ".")
    from lidar_slam_tpu.utils.dataset import load_gt_poses
    from lidar_slam_tpu.utils.io import discover_frames, load_scan
    from lidar_slam_tpu.utils.metrics import ate_rmse, rpe

    ap = argparse.ArgumentParser(
        description="reference-mirror odometry (f64 CPU) for ATE comparison"
    )
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--voxel-size", type=float, default=0.5)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    frames = discover_frames(args.data_dir)
    if args.frames:
        frames = frames[: args.frames]
    scans = [load_scan(p) for _, p in frames]
    t0 = time.perf_counter()
    poses, _ = run_odometry(scans, voxel_size=args.voxel_size, verbose=True)
    wall = time.perf_counter() - t0
    print(f"{len(scans)} scans in {wall:.1f}s ({len(scans)/wall:.2f} scans/s)")
    import os

    gt_path = os.path.join(args.data_dir, "poses_gt.txt")
    if os.path.exists(gt_path):
        gt = load_gt_poses(gt_path)
        print(f"ATE RMSE vs GT: {ate_rmse(poses, gt):.4f} m")
        t_err, r_err = rpe(poses, gt)
        print(f"RPE: {t_err:.4f} m / {r_err:.5f} rad")
    if args.out:
        np.savetxt(args.out, poses[:, :3, :].reshape(len(poses), 12), fmt="%.6f")
        print(f"trajectory -> {args.out}")


if __name__ == "__main__":
    main()
