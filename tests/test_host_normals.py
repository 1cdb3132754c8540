import numpy as np
import pytest

from lidar_slam_tpu.config import tiny_config
from lidar_slam_tpu.models.pipeline import SlamEngine
from lidar_slam_tpu.utils.dataset import (
    generate_trajectory,
    generate_world,
    render_scan,
    route_half_for,
)
from lidar_slam_tpu.utils.metrics import ate_rmse
from lidar_slam_tpu.utils.native import (
    native_available,
    normals_radius_host,
    voxel_downsample_host,
)


def test_native_normals_match_device(rng):
    """C++ grid-hash radius normals vs the device moment-accumulation op."""
    import jax.numpy as jnp

    from lidar_slam_tpu.ops.normals import estimate_normals_radius

    n_true = np.array([1.0, 2.0, 2.0])
    n_true /= np.linalg.norm(n_true)
    u = np.array([2.0, -1.0, 0.0]) / np.sqrt(5)
    v = np.cross(n_true, u)
    uv = rng.uniform(-6, 6, size=(2048, 2))
    pts = (uv[:, :1] * u + uv[:, 1:] * v + 40.0).astype(np.float32)
    host = normals_radius_host(pts, 1.2)
    dev = np.asarray(
        estimate_normals_radius(jnp.asarray(pts), jnp.ones(len(pts), bool), 1.2)
    )
    agree = np.abs((host * dev).sum(1))
    assert (agree > 0.995).mean() > 0.99
    assert (np.abs(host @ n_true) > 0.999).all()


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
def test_engine_host_normals_pipeline():
    """Full host pipeline (voxelize + normals on host) tracks the device
    pipeline's trajectory."""
    n = 12
    half = route_half_for(60)
    world = generate_world(0, route_half=half)
    gt = generate_trajectory(60, half=half)[:n]
    rng = np.random.default_rng(0)
    scans = [render_scan(world, gt[i], rng, max_range=30.0, max_points=4000)
             for i in range(n)]
    base = tiny_config(max_raw_points=4096, max_points=4096,
                       lc_cloud_points=1024, max_frames=16).replace(
        voxel_size=0.8)

    dev = SlamEngine(base)
    for s in scans:
        dev.push_scan(voxel_downsample_host(s, 0.8, 4096))
    # device engine consumed host-voxelized clouds? No: device path voxelizes
    # again (idempotent on already-voxelized data at same grid). Compare ATE.
    ate_dev = ate_rmse(dev.trajectory(), gt)

    host = SlamEngine(base.replace(host_voxelize=True, host_normals=True))
    for s in scans:
        ds = voxel_downsample_host(s, 0.8, 4096)
        nrm = normals_radius_host(ds, base.effective_normal_radius)
        host.push_scan(ds, normals=nrm)
    ate_host = ate_rmse(host.trajectory(), gt)
    assert ate_host < max(2.0 * ate_dev, 0.3), (ate_host, ate_dev)


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
def test_resident_host_normals_matches_streaming():
    """preload(scans, normals=...) + run_preloaded reproduces the streaming
    push_scan(..., normals=...) host-normals pipeline exactly (same clouds,
    same normals, same dispatch math — only the transfer pattern differs)."""
    from lidar_slam_tpu.utils.native import normals_knn_host

    n = 12
    half = route_half_for(60)
    world = generate_world(0, route_half=half)
    gt = generate_trajectory(60, half=half)[:n]
    rng = np.random.default_rng(0)
    scans, normals = [], []
    for i in range(n):
        s = render_scan(world, gt[i], rng, max_range=30.0, max_points=4000)
        ds = voxel_downsample_host(s, 0.8, 4096)
        scans.append(ds)
        normals.append(normals_knn_host(ds, k=20))
    cfg = tiny_config(max_raw_points=4096, max_points=4096,
                      lc_cloud_points=1024, max_frames=16,
                      dispatch_block=4).replace(
        voxel_size=0.8, host_voxelize=True, host_normals=True)

    stream = SlamEngine(cfg)
    for s, nr in zip(scans, normals):
        stream.push_scan(s, normals=nr)
    stream.flush()

    resident = SlamEngine(cfg)
    resident.preload(scans, normals=normals)
    resident.run_preloaded()

    np.testing.assert_allclose(
        stream.trajectory(), resident.trajectory(), atol=1e-5
    )
    m_s, m_r = stream.metrics(), resident.metrics()
    np.testing.assert_array_equal(m_s["icp_iters"], m_r["icp_iters"])
    assert m_s["loop_count"] == m_r["loop_count"]
