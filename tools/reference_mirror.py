"""Faithful NumPy/SciPy mirror of the reference C++ odometry pipeline.

The north-star accuracy criterion is "ATE RMSE within 5% of the C++
reference" (BASELINE.json), but the reference cannot be built here (no
Eigen/GTSAM/ROS2 in the image). This module reproduces its odometry math
*numerically* — f64 throughout, exact KD-tree queries, the same constants and
control flow — so the TPU engine can be compared against reference behavior
on any dataset. Every stage cites the reference file:line it mirrors.

Scope: frame-to-frame odometry (BASELINE config ladder #1) AND the full
loop-closure detection stack (round 5): f64 Scan Context descriptors
(scan_context.hpp:24-145), the reference's exact candidate walk — linear
prior-frame scan, frame-gap filter, SC threshold, ascending sort,
verify-until-max_candidates-ACCEPTED with 30-iteration identity-init ICP
(loop_closure.hpp:66-126) — and the node's cadence (detect every 10th frame
past frame 50, slam_node.cpp:160-167). Only the GTSAM backend itself stays
out of scope (binary dependency); its factor model is reproduced by
lidar_slam_tpu.models.pose_graph.optimize_host (f64 LM) for the full-SLAM
anchors.
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
                       min_error=1e-9, tree=None, normals=None):
    """icp.hpp:157-258 — full reference control flow, f64.

    ``tree``/``normals``: optional precomputed target KD-tree and normals
    (deterministic functions of ``target``; passing them changes nothing
    numerically). The reference rebuilds both on every call
    (icp.hpp:166-171) — callers that verify the same target repeatedly
    (mirror loop detection) cache them."""
    if tree is None:
        tree = cKDTree(target)
    if normals is None:
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


# ---------------------------------------------------------------------------
# Loop-closure detection mirror (round 5 — VERDICT r4 item 2)
# ---------------------------------------------------------------------------

SC_NUM_RINGS = 20       # scan_context.hpp:27
SC_NUM_SECTORS = 60     # scan_context.hpp:28
SC_MAX_RANGE = 80.0     # scan_context.hpp:29
SC_MIN_RANGE = 0.1      # scan_context.hpp:59


def scan_context(cloud: np.ndarray) -> np.ndarray:
    """scan_context.hpp:44-82 — 20x60 max-height polar descriptor, f64.

    Bin indices truncate (C++ int cast of a positive value) and clamp; the
    range filter keeps 0.1 <= r <= 80; empty bins become 0."""
    pts = cloud.astype(np.float64)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    rng = np.sqrt(x * x + y * y)
    keep = (rng <= SC_MAX_RANGE) & (rng >= SC_MIN_RANGE)
    rng, z = rng[keep], z[keep]
    ang = np.arctan2(y[keep], x[keep]) + np.pi  # [0, 2pi]
    ring = np.clip((rng / (SC_MAX_RANGE / SC_NUM_RINGS)).astype(np.int64),
                   0, SC_NUM_RINGS - 1)
    sector = np.clip(
        (ang / (2.0 * np.pi / SC_NUM_SECTORS)).astype(np.int64),
        0, SC_NUM_SECTORS - 1,
    )
    desc = np.full((SC_NUM_RINGS, SC_NUM_SECTORS), -np.inf)
    np.maximum.at(desc, (ring, sector), z)
    desc[desc < -1000] = 0.0  # scan_context.hpp:76-81
    return desc


def sc_distance(a: np.ndarray, b: np.ndarray) -> float:
    """scan_context.hpp:90-102, 121-142 — min over all 60 column shifts of
    (1 - cosine similarity) on the whole flattened descriptor."""
    return float(sc_distances_to_db(a, b[None])[0])


def sc_distances_to_db(query: np.ndarray, db: np.ndarray) -> np.ndarray:
    """Vectorized form of ScanContext::distance against a stacked DB
    (F, 20, 60): one (60, 1200) x (1200, F) f64 matmul — numerically the
    same sums as the reference's per-pair loops (f64; summation order is
    the only difference)."""
    R, S = SC_NUM_RINGS, SC_NUM_SECTORS
    # sum_ab(shift) = sum_ij a[i,j] * b[i,(j+shift)%S]  ==  <roll(a, shift),
    # b>; the shift set {0..S-1} is closed under negation mod S, so rolling
    # the query by -s enumerates the same 60 dot products (only the argmin
    # shift label differs, which the reference discards). Build the 60
    # rolled queries once -> one f64 matmul against the stacked DB.
    rolled = np.stack(
        [np.roll(query, -s, axis=1).ravel() for s in range(S)]
    )  # (S, R*S)
    flat_db = db.reshape(len(db), R * S)
    ab = rolled @ flat_db.T                       # (S, F)
    qn = np.sqrt(np.sum(query * query))
    dbn = np.sqrt(np.sum(flat_db * flat_db, axis=1))
    norm = qn * dbn                               # (F,)
    sim = np.where(norm < 1e-10, 0.0, ab.max(axis=0) / np.maximum(norm, 1e-300))
    return np.where(norm < 1e-10, 1.0, 1.0 - sim)


class LoopClosureDetectorMirror:
    """loop_closure.hpp:41-149 in f64 NumPy/SciPy.

    detect() reproduces the reference walk exactly: candidates = every prior
    frame with gap >= frame_gap and SC distance < threshold, sorted ascending
    (std::sort on (dist, idx) pairs), verified in order by the full
    reference-settings ICP (30 iterations, tol 1e-6, identity init, internal
    k=20 target normals) until ``max_candidates`` are ACCEPTED — the
    unbounded verify-until-accepted walk the engine's tranche bound
    approximates (docs/PARITY.md row 9)."""

    def __init__(self, frame_gap=50, sc_distance_threshold=0.2,
                 icp_fitness_threshold=0.3, max_candidates=3,
                 icp_max_iterations=30, icp_tolerance=1e-6):
        self.frame_gap = frame_gap
        self.sc_threshold = sc_distance_threshold
        self.fitness_threshold = icp_fitness_threshold
        self.max_candidates = max_candidates
        self.icp_max_iterations = icp_max_iterations
        self.icp_tolerance = icp_tolerance
        self.descriptors: list[np.ndarray] = []
        self.clouds: list[np.ndarray] = []
        self.frame_indices: list[int] = []
        # per-candidate (KD-tree, normals) cache: deterministic functions of
        # the stored cloud, so reusing them is numerically identical to the
        # reference's per-call rebuild (icp.hpp:166-171) — candidates repeat
        # heavily across adjacent cadence ticks
        self._tgt_cache: dict[int, tuple] = {}
        self.cache_limit = 256

    def add_frame(self, cloud: np.ndarray, frame_idx: int) -> None:
        self.descriptors.append(scan_context(cloud))
        self.clouds.append(np.asarray(cloud, np.float64))
        self.frame_indices.append(int(frame_idx))

    def detect(self, verbose=False) -> list[dict]:
        if len(self.descriptors) < 2:
            return []
        q = len(self.descriptors) - 1
        q_frame = self.frame_indices[q]
        dists = sc_distances_to_db(
            self.descriptors[q], np.stack(self.descriptors[:q])
        )
        candidates = sorted(
            (float(dists[i]), i)
            for i in range(q)
            if (q_frame - self.frame_indices[i]) >= self.frame_gap
            and dists[i] < self.sc_threshold
        )
        results = []
        for sc_dist, i in candidates:
            if len(results) >= self.max_candidates:
                break
            if i not in self._tgt_cache:
                if len(self._tgt_cache) >= self.cache_limit:
                    self._tgt_cache.pop(next(iter(self._tgt_cache)))
                t = cKDTree(self.clouds[i])
                self._tgt_cache[i] = (t, estimate_normals(self.clouds[i], t, 20))
            tree, nrm = self._tgt_cache[i]
            T, conv, err, _ = icp_point_to_plane(
                self.clouds[q], self.clouds[i],
                max_iterations=self.icp_max_iterations,
                tolerance=self.icp_tolerance,
                tree=tree, normals=nrm,
            )
            if verbose:
                print(f"  verify {q_frame}<->{self.frame_indices[i]} "
                      f"sc={sc_dist:.3f} fit={err:.3f} conv={conv}",
                      flush=True)
            if conv and err < self.fitness_threshold:
                results.append(dict(
                    query_frame=q_frame,
                    match_frame=self.frame_indices[i],
                    transform=T,
                    sc_distance=sc_dist,
                    icp_fitness=float(err),
                ))
        return results


def run_full_slam(scans, voxel_size=0.5, max_iterations=50, tolerance=1e-6,
                  min_points=1000, divergence_error=1.0,
                  loop_check_every=10, loop_start_frame=50,
                  detector: LoopClosureDetectorMirror | None = None,
                  verbose=False, on_frame=None):
    """The full reference pipeline in f64: process_frame odometry
    (slam_node.cpp:118-151) + addFrame/detect on the node's cadence
    (slam_node.cpp:159-167; frame 0 is never addFrame'd — the ctor skips
    the detector, slam_node.cpp:64-89). Returns (poses, loops, stats);
    apply lidar_slam_tpu.models.pose_graph.optimize_host for the backend.
    """
    det = detector or LoopClosureDetectorMirror()
    poses = [np.eye(4)]
    prev = voxel_downsample(scans[0], voxel_size)
    stats, loops = [], []
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
        det.add_frame(curr, i)
        if i % loop_check_every == 0 and i > loop_start_frame:
            found = det.detect(verbose=verbose)
            loops.extend(found)
            if verbose and found:
                for lc_hit in found:
                    print(f"Loop: {lc_hit['query_frame']}<->"
                          f"{lc_hit['match_frame']}", flush=True)
        if on_frame is not None:
            on_frame(i, poses, loops)
    return np.stack(poses), loops, stats


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
