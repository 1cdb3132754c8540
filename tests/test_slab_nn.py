import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from lidar_slam_tpu.ops.slab_nn import nn1_slab
from lidar_slam_tpu.ops.voxel import voxel_downsample


def _sorted_cloud(rng, n=3000, spread=40.0):
    pts = (rng.uniform(-spread, spread, (n, 3))).astype(np.float32)
    pts[:, 2] = rng.uniform(0, 4, n)
    pad = np.zeros((4096, 3), np.float32)
    pad[:n] = pts
    mask = np.zeros(4096, bool)
    mask[:n] = True
    # voxel kernel output = x-major sorted (the slab precondition)
    return voxel_downsample(jnp.asarray(pad), jnp.asarray(mask), 0.4, 4096)


def test_slab_exact_for_small_motion(rng):
    tgt = _sorted_cloud(rng)
    # consecutive-scan regime: queries near targets; invalid rows at the far
    # sentinel (the ICP caller's convention — padding at the origin would
    # pollute tile extents)
    src = jnp.where(
        tgt.mask[:, None],
        tgt.points + jnp.asarray(rng.normal(0, 0.3, (4096, 3)).astype(np.float32)),
        1.0e6,
    )
    idx, d2 = nn1_slab(src, tgt.points, tgt.mask, ts=256, window=1024)
    tm = np.asarray(tgt.mask)
    tpts = np.asarray(tgt.points)[tm]
    ref_d, ref_i = cKDTree(tpts).query(np.asarray(src)[tm])
    # map ref indices back (valid prefix: identity mapping)
    agree = (np.asarray(idx)[tm] == ref_i).mean()
    assert agree > 0.999, agree
    np.testing.assert_allclose(
        np.sqrt(np.asarray(d2)[tm]), ref_d, atol=1e-3
    )


def test_slab_respects_target_mask(rng):
    tgt = _sorted_cloud(rng, n=2000)
    src = tgt.points[:512] + 0.05
    idx, _ = nn1_slab(src, tgt.points, tgt.mask, ts=128, window=512)
    assert np.asarray(idx).max() < int(tgt.count())


def test_slab_in_icp_recovers_transform(rng):
    from scipy.spatial.transform import Rotation

    from lidar_slam_tpu.config import ICPConfig
    from lidar_slam_tpu.ops import se3
    from lidar_slam_tpu.ops.icp import icp_point_to_plane
    from lidar_slam_tpu.ops.normals import estimate_normals_radius
    from lidar_slam_tpu.types import PointCloud
    from lidar_slam_tpu.ops.slab_nn import nn1_slab

    tgt = _sorted_cloud(rng)
    R = Rotation.from_rotvec([0.005, -0.01, 0.02]).as_matrix().astype(np.float32)
    T_true = se3.from_rt(jnp.asarray(R), jnp.asarray([0.3, -0.2, 0.05]))
    src = PointCloud(
        se3.apply(se3.inverse(T_true), tgt.points), tgt.mask
    )
    normals = estimate_normals_radius(tgt.points, tgt.mask, radius=1.0)
    res = icp_point_to_plane(
        src, tgt, normals, ICPConfig(max_iterations=20, tolerance=1e-5),
        nn1_fn=lambda s, t, m: nn1_slab(s, t, m, ts=256, window=1024),
    )
    err = np.asarray(se3.log(se3.compose(res.transformation, se3.inverse(T_true))))
    assert np.abs(err[:3]).max() < 5e-3, err
    assert np.abs(err[3:]).max() < 5e-2, err


def test_native_voxelizer_output_sorted(rng):
    from lidar_slam_tpu.utils.native import native_available, voxel_downsample_host

    if not native_available():
        return
    pts = rng.uniform(-30, 30, (5000, 3)).astype(np.float32)
    out = voxel_downsample_host(pts, 1.0)
    q = np.floor(out / 1.0).astype(np.int64) + (1 << 20)  # C++ offset
    keys = (q[:, 0] << 42) + (q[:, 1] << 21) + q[:, 2]
    assert (np.diff(keys) >= 0).all(), "host voxelizer must emit key-sorted"
