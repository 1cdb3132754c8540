"""tools/kitti_eval.py end-to-end on a synthetic KITTI-layout sequence."""

import os
import runpy
import sys

import numpy as np
import pytest

from lidar_slam_tpu.utils.dataset import (
    generate_trajectory,
    generate_world,
    render_scan,
    route_half_for,
)

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "kitti_eval.py")


def _make_kitti_seq(root, n=12):
    """sequences/00 with velodyne .bins, calib Tr, and cam-frame poses."""
    seq = os.path.join(root, "sequences", "00")
    velo = os.path.join(seq, "velodyne")
    os.makedirs(velo)
    half = route_half_for(n)
    world = generate_world(0, route_half=half)
    gt = generate_trajectory(n, half=half)
    rng = np.random.default_rng(0)
    for i in range(n):
        pts = render_scan(world, gt[i], rng, max_points=1500).astype(np.float32)
        scan = np.concatenate(
            [pts, np.zeros((len(pts), 1), np.float32)], axis=1
        )
        scan.tofile(os.path.join(velo, f"{i:06d}.bin"))
    # nontrivial velodyne->cam transform (KITTI's axis permutation)
    Tr = np.eye(4)
    Tr[:3, :3] = np.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    Tr[:3, 3] = [0.05, -0.1, -0.2]
    with open(os.path.join(seq, "calib.txt"), "w") as f:
        f.write("Tr: " + " ".join(f"{v:.9f}" for v in Tr[:3].ravel()) + "\n")
    gt_cam = np.einsum("ij,njk,kl->nil", Tr, gt, np.linalg.inv(Tr))
    os.makedirs(os.path.join(root, "poses"))
    with open(os.path.join(root, "poses", "00.txt"), "w") as f:
        for T in gt_cam:
            f.write(" ".join(f"{v:.9f}" for v in T[:3].ravel()) + "\n")
    return seq, gt


def _run_tool(argv):
    old = sys.argv
    sys.argv = ["kitti_eval.py"] + argv
    try:
        with pytest.raises(SystemExit) as exc:
            runpy.run_path(TOOL, run_name="__main__")
        return exc.value.code
    finally:
        sys.argv = old


def test_kitti_eval_end_to_end(tmp_path, capsys):
    seq, gt = _make_kitti_seq(str(tmp_path))
    code = _run_tool([
        "--sequence", seq, "--frames", "12", "--max-points", "2048",
        "--voxel", "0.8", "--sample", "0",
        "--out", str(tmp_path / "row.md"),
    ])
    out = capsys.readouterr().out
    assert code == 0, out
    assert "ATE RMSE" in out
    ate = float(out.split("ATE RMSE")[1].split("m")[0])
    assert ate < 2.0, out  # engine tracked the synthetic route
    assert (tmp_path / "row.md").read_text().startswith("| KITTI 00")


def test_kitti_eval_missing_dataset(tmp_path, capsys):
    code = _run_tool(["--sequence", str(tmp_path / "nope")])
    assert code == 2
    assert "not present" in capsys.readouterr().out
