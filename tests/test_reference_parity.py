"""Numerical parity: TPU engine odometry vs the f64 reference mirror.

The mirror (tools/reference_mirror.py) reproduces the C++ reference's
odometry math exactly (same constants, control flow, f64); the TPU engine
must track it within the BASELINE tolerance band.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")
from tools.reference_mirror import (  # noqa: E402
    icp_point_to_plane as ref_icp,
    run_odometry as ref_odometry,
    voxel_downsample as ref_voxel,
)

from lidar_slam_tpu.config import tiny_config  # noqa: E402
from lidar_slam_tpu.models.pipeline import SlamEngine  # noqa: E402
from lidar_slam_tpu.utils.dataset import (  # noqa: E402
    generate_trajectory,
    generate_world,
    render_scan,
    route_half_for,
)
from lidar_slam_tpu.utils.metrics import ate_rmse  # noqa: E402


@pytest.fixture(scope="module")
def sequence():
    n = 20
    half = route_half_for(60)
    world = generate_world(0, route_half=half)
    gt = generate_trajectory(60, half=half)[:n]
    rng = np.random.default_rng(0)
    scans = [
        render_scan(world, gt[i], rng, max_range=30.0, max_points=4000)
        for i in range(n)
    ]
    return scans, gt


def test_single_pair_icp_parity(sequence):
    """One registration: TPU f32 engine vs f64 mirror on the same clouds."""
    import jax.numpy as jnp

    from lidar_slam_tpu.config import ICPConfig
    from lidar_slam_tpu.ops import se3
    from lidar_slam_tpu.ops.icp import icp_point_to_plane_auto
    from lidar_slam_tpu.types import PointCloud

    scans, _ = sequence
    tgt = ref_voxel(scans[5], 0.8).astype(np.float32)
    src = ref_voxel(scans[6], 0.8).astype(np.float32)
    T_ref, conv_ref, err_ref, _ = ref_icp(
        src.astype(np.float64), tgt.astype(np.float64), max_iterations=30,
        tolerance=1e-4,
    )
    cap = 1 << int(np.ceil(np.log2(max(len(src), len(tgt)))))
    res = icp_point_to_plane_auto(
        PointCloud.from_numpy(src, cap),
        PointCloud.from_numpy(tgt, cap),
        ICPConfig(max_iterations=30, tolerance=1e-4),
    )
    # transforms agree to sub-cm / sub-milliradian
    diff = np.asarray(
        se3.log(se3.compose(res.transformation,
                            se3.inverse(jnp.asarray(T_ref, jnp.float32))))
    )
    assert np.abs(diff[:3]).max() < 5e-3, diff
    assert np.abs(diff[3:]).max() < 3e-2, diff
    # fitness agrees to a few percent
    assert abs(float(res.final_error) - err_ref) / err_ref < 0.1


def test_odometry_trajectory_parity(sequence):
    """20-frame odometry: engine ATE must be within the BASELINE band of the
    f64 mirror's ATE (both vs ground truth)."""
    scans, gt = sequence
    ref_poses, _ = ref_odometry(
        scans, voxel_size=0.8, min_points=8, tolerance=1e-4
    )
    ref_ate = ate_rmse(ref_poses, gt)

    cfg = tiny_config(
        max_raw_points=4096, max_points=4096, lc_cloud_points=1024,
        max_frames=32,
    ).replace(voxel_size=0.8)
    eng = SlamEngine(cfg)
    for s in scans:
        eng.push_scan(s)
    tpu_ate = ate_rmse(eng.trajectory(), gt)

    # mirror and engine must both track GT; engine within mirror + 5%-band
    # (absolute floor of 5 cm for near-zero mirror ATE)
    assert tpu_ate <= max(ref_ate * 1.25, ref_ate + 0.05), (tpu_ate, ref_ate)
