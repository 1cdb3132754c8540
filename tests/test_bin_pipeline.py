"""End-to-end over KITTI .bin-format frames (the reference's quirk #4 meant
.bin dirs silently mis-parsed; here they are first-class)."""

import numpy as np

from lidar_slam_tpu.cli import main
from lidar_slam_tpu.utils.dataset import load_gt_poses
from lidar_slam_tpu.utils.io import discover_frames, load_scan
from lidar_slam_tpu.utils.metrics import ate_rmse


def test_bin_dataset_cli_roundtrip(tmp_path):
    ds = str(tmp_path / "binds")
    out = str(tmp_path / "out")
    rc = main(
        ["make-dataset", "--out", ds, "--frames", "10",
         "--scan-points", "4000", "--format", "bin"]
    )
    assert rc == 0
    frames = discover_frames(ds)
    assert len(frames) == 10
    assert frames[0][1].endswith(".bin")
    # loader dispatches on extension (fixes reference quirk #4)
    pts = load_scan(frames[0][1])
    assert pts.shape[1] == 3 and len(pts) > 1000

    rc = main(
        ["run", "--data-dir", ds, "--out-dir", out, "--preset", "tiny",
         "--cpu", "--voxel-size", "0.8", "--max-points", "4096"]
    )
    assert rc == 0
    import os

    traj = np.loadtxt(os.path.join(out, "trajectory.txt"))
    assert traj.shape == (10, 12)
    gt = load_gt_poses(os.path.join(ds, "poses_gt.txt"))
    est = np.tile(np.eye(4, dtype=np.float64), (10, 1, 1))
    est[:, :3, :] = traj.reshape(10, 3, 4)
    assert ate_rmse(est, gt) < 3.0  # short segment, sparse scans


def test_streaming_warmup_run_matches_plain(tmp_path):
    """--warmup-run in streaming mode (compile-absorbing partial pass +
    engine reset + fresh loader) must not change the result."""
    import os

    ds = str(tmp_path / "plyds")
    rc = main(["make-dataset", "--out", ds, "--frames", "14",
               "--scan-points", "4000"])
    assert rc == 0
    outs = []
    for flag in ([], ["--warmup-run"]):
        out = str(tmp_path / f"out{len(outs)}")
        rc = main(
            ["run", "--data-dir", ds, "--out-dir", out, "--preset", "tiny",
             "--cpu", "--voxel-size", "0.8", "--max-points", "4096",
             "--dispatch-block", "4"] + flag
        )
        assert rc == 0
        outs.append(np.loadtxt(os.path.join(out, "trajectory.txt")))
    np.testing.assert_allclose(outs[1], outs[0], atol=1e-6)
