import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from lidar_slam_tpu.ops.grid_nn import build_grid, make_grid_corr_fn, nn1_grid


def test_grid_nn_matches_exact_for_close_queries(rng):
    """Queries near the target surface (the ICP regime): the window search
    must find the true NN whenever it is within one cell."""
    tgt = (rng.uniform(-20, 20, size=(2000, 3))).astype(np.float32)
    tgt[:, 2] = rng.uniform(0, 3, 2000)  # LiDAR-ish z extent
    mask = np.ones(2000, bool)
    # queries = perturbed target points (correspondence distances << cell)
    src = tgt[:500] + rng.normal(0, 0.1, (500, 3)).astype(np.float32)
    grid = build_grid(jnp.asarray(tgt), jnp.asarray(mask), cell=2.0)
    idx, d2 = nn1_grid(jnp.asarray(src), grid, window=32)
    ref_d, ref_i = cKDTree(tgt).query(src, k=1)
    match = (np.asarray(idx) == ref_i).mean()
    assert match > 0.98, match
    np.testing.assert_allclose(
        np.sqrt(np.asarray(d2))[np.asarray(idx) == ref_i],
        ref_d[np.asarray(idx) == ref_i],
        atol=1e-3,
    )


def test_grid_nn_respects_mask(rng):
    tgt = rng.uniform(-5, 5, size=(400, 3)).astype(np.float32)
    mask = np.zeros(400, bool)
    mask[:300] = True
    src = tgt[:100] + 0.05
    grid = build_grid(jnp.asarray(tgt), jnp.asarray(mask), cell=2.0)
    idx, _ = nn1_grid(jnp.asarray(src), grid, window=32)
    assert np.asarray(idx).max() < 300


def test_grid_corr_fn_in_icp(rng):
    """End-to-end: ICP with the grid correspondence backend recovers a
    known small transform."""
    from scipy.spatial.transform import Rotation

    from lidar_slam_tpu.config import ICPConfig
    from lidar_slam_tpu.ops import se3
    from lidar_slam_tpu.ops.icp import icp_point_to_plane
    from lidar_slam_tpu.ops.normals import estimate_normals
    from lidar_slam_tpu.types import PointCloud

    n3 = 200
    ground = np.stack([rng.uniform(-10, 10, n3), rng.uniform(-10, 10, n3),
                       np.zeros(n3)], axis=1)
    wall1 = np.stack([rng.uniform(-10, 10, n3), np.full(n3, 8.0),
                      rng.uniform(0, 5, n3)], axis=1)
    wall2 = np.stack([np.full(n3, -6.0), rng.uniform(-10, 10, n3),
                      rng.uniform(0, 5, n3)], axis=1)
    tgt_pts = np.concatenate([ground, wall1, wall2]).astype(np.float32)
    R = Rotation.from_rotvec([0.01, -0.02, 0.03]).as_matrix().astype(np.float32)
    T_true = se3.from_rt(jnp.asarray(R), jnp.asarray([0.1, -0.2, 0.05]))
    src_pts = np.asarray(se3.apply(se3.inverse(T_true), jnp.asarray(tgt_pts)))

    src = PointCloud.from_numpy(src_pts, 640)
    tgt = PointCloud.from_numpy(tgt_pts, 640)
    normals = estimate_normals(tgt.points, tgt.mask, k=10)
    corr = make_grid_corr_fn(tgt.points, tgt.mask, cell=2.0, window=32)
    res = icp_point_to_plane(src, tgt, normals, ICPConfig(max_iterations=25),
                             nn1_fn=corr)
    err = np.asarray(se3.log(se3.compose(res.transformation, se3.inverse(T_true))))
    assert np.abs(err[:3]).max() < 5e-3, err
    assert np.abs(err[3:]).max() < 5e-2, err
