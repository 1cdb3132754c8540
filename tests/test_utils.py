import json
import os

import numpy as np

from lidar_slam_tpu.utils.dataset import (
    generate_trajectory,
    generate_world,
    load_gt_poses,
    make_dataset,
    render_scan,
)
from lidar_slam_tpu.utils.metrics import ate_rmse, rpe, umeyama_alignment


def test_umeyama_recovers_rigid(rng):
    src = rng.normal(size=(50, 3))
    ang = 0.7
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
    )
    t = np.array([1.0, -2.0, 3.0])
    dst = src @ R.T + t
    R2, t2 = umeyama_alignment(src, dst)
    np.testing.assert_allclose(R2, R, atol=1e-6)
    np.testing.assert_allclose(t2, t, atol=1e-6)


def test_ate_zero_for_identical():
    poses = generate_trajectory(20)
    assert ate_rmse(poses, poses) < 1e-6
    t_err, r_err = rpe(poses, poses)
    assert t_err < 1e-6 and r_err < 1e-3


def test_ate_alignment_invariance():
    poses = generate_trajectory(20)
    shifted = poses.copy()
    shifted[:, :3, 3] += np.array([10.0, -5.0, 2.0])
    assert ate_rmse(shifted, poses, align=True) < 1e-4
    assert ate_rmse(shifted, poses, align=False) > 10.0


def test_trajectory_revisits_start():
    poses = generate_trajectory(80)
    # last frames re-drive the start (overlap = n/8)
    d = np.linalg.norm(poses[70][:3, 3] - poses[0][:3, 3])
    assert d < 0.5, d
    # per-frame step ~1.2 m
    steps = np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=1)
    assert 0.8 < steps.mean() < 1.6


def test_render_scan_sensor_frame(rng):
    world = generate_world(0, route_half=8.0)
    pose = generate_trajectory(40)[3]
    scan = render_scan(world, pose, rng, max_range=20.0, max_points=3000)
    r = np.linalg.norm(scan[:, :2], axis=1)
    assert r.max() < 20.6  # range cut (+noise) in the sensor frame
    assert len(scan) > 500


def test_make_dataset_roundtrip(tmp_path, rng):
    out, gt = make_dataset(str(tmp_path / "ds"), n_frames=6, seed=1,
                           max_points=500)
    files = sorted(os.listdir(out))
    assert sum(f.endswith(".ply") for f in files) == 6
    gt2 = load_gt_poses(os.path.join(out, "poses_gt.txt"))
    np.testing.assert_allclose(gt2[:, :3, :], gt[:, :3, :], atol=1e-5)


def test_export_all(tmp_path):
    # minimal fake engine exercising utils/export.py
    from lidar_slam_tpu.config import tiny_config
    from lidar_slam_tpu.utils import export

    class FakeEngine:
        config = tiny_config()

        def trajectory(self):
            return generate_trajectory(5)

        def global_map(self):
            return np.zeros((10, 3), np.float32)

        def occupancy(self):
            g = np.zeros((256, 256), np.uint8)
            g[100:110, 120:130] = 1
            return g

        def metrics(self):
            return {
                "icp_error": np.zeros(5),
                "icp_iters": np.zeros(5, np.int32),
                "icp_converged": np.ones(5, bool),
                "frame_npts": np.full(5, 100, np.int32),
                "loop_count": 2,
            }

    out = str(tmp_path / "art")
    export.export_all(out, FakeEngine(), extra={"ate_rmse": 0.1})
    for f in ["trajectory.txt", "trajectory_tum.txt", "map.ply",
              "occupancy.npz", "occupancy.pgm", "metrics.jsonl"]:
        assert os.path.exists(os.path.join(out, f)), f
    lines = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert lines[-1]["loop_count"] == 2
    assert lines[-1]["ate_rmse"] == 0.1


def test_native_loader_fallback(tmp_path, rng):
    from lidar_slam_tpu.utils.io import save_ply
    from lidar_slam_tpu.utils.native import FrameLoader

    pts = rng.normal(size=(100, 3)).astype(np.float32)
    paths = []
    for i in range(5):
        p = str(tmp_path / f"{i:06d}.ply")
        save_ply(p, pts + i)
        paths.append(p)
    with FrameLoader(paths, cap=256, window=2, threads=1) as fl:
        for i in range(5):
            np.testing.assert_allclose(fl.get(i), pts + i)
