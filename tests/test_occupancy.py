"""Occupancy-grid op tests (reference slam_node.cpp:211-229 semantics).

The scatter-free one-hot-matmul update must be bit-identical to a direct
NumPy scatter of the reference's filter, drops must be counted (the
reference's hash set is unbounded — a dense grid may not truncate
silently), and KITTI-scale extents (>410 m routes) must fit the default
grid."""

import jax.numpy as jnp
import numpy as np

from lidar_slam_tpu.config import OccupancyGridConfig
from lidar_slam_tpu.ops.occupancy import empty_grid, update_occupancy


def _reference_scatter(pts, sensor, cfg):
    D, res = cfg.grid_dim, cfg.resolution
    r = np.hypot(pts[:, 0] - sensor[0], pts[:, 1] - sensor[1])
    keep = (
        (pts[:, 2] >= cfg.height_min) & (pts[:, 2] <= cfg.height_max)
        & (r <= cfg.max_range) & (r >= cfg.min_range)
    )
    cx = np.floor((pts[:, 0] - cfg.origin_x) / res).astype(int) + D // 2
    cy = np.floor((pts[:, 1] - cfg.origin_y) / res).astype(int) + D // 2
    ok = keep & (cx >= 0) & (cx < D) & (cy >= 0) & (cy < D)
    g = np.zeros((D, D), np.uint8)
    g[cx[ok], cy[ok]] = 1
    return g, int((keep & ~ok).sum())


def test_update_matches_reference_scatter(rng):
    cfg = OccupancyGridConfig(grid_dim=1024)
    pts = np.stack(
        [rng.uniform(-30, 30, 4000), rng.uniform(-30, 30, 4000),
         rng.uniform(0.0, 2.5, 4000)], 1,
    ).astype(np.float32)
    sensor = np.array([3.0, -2.0], np.float32)
    g, nd = update_occupancy(
        empty_grid(cfg), jnp.asarray(pts), jnp.ones(4000, bool),
        jnp.asarray(sensor), cfg,
    )
    ref, ref_drop = _reference_scatter(pts, sensor, cfg)
    np.testing.assert_array_equal(np.asarray(g), ref)
    assert int(nd) == ref_drop == 0


def test_out_of_grid_points_are_counted(rng):
    cfg = OccupancyGridConfig(grid_dim=256)  # only +-25.6 m
    pts = np.stack(
        [rng.uniform(-35, 35, 3000), rng.uniform(-35, 35, 3000),
         np.full(3000, 1.0)], 1,
    ).astype(np.float32)
    sensor = np.zeros(2, np.float32)
    g, nd = update_occupancy(
        empty_grid(cfg), jnp.asarray(pts), jnp.ones(3000, bool),
        jnp.asarray(sensor), cfg,
    )
    ref, ref_drop = _reference_scatter(pts, sensor, cfg)
    assert ref_drop > 0
    assert int(nd) == ref_drop
    np.testing.assert_array_equal(np.asarray(g), ref)


def test_kitti_scale_route_fits_default_grid(rng):
    """A >410 m route (beyond the old 4096-cell grid) maps with zero drops
    into the 8192-cell default — the VERDICT r2 occupancy-extents gap."""
    cfg = OccupancyGridConfig()
    assert cfg.grid_dim * cfg.resolution / 2 > 750  # covers the bench route
    g = empty_grid(cfg)
    dropped = jnp.int32(0)
    for cx in (0.0, 450.0, -450.0, 700.0):
        pts = np.stack(
            [cx + rng.uniform(-20, 20, 2000), rng.uniform(-20, 20, 2000),
             np.full(2000, 1.0)], 1,
        ).astype(np.float32)
        sensor = np.array([cx, 0.0], np.float32)
        g, nd = update_occupancy(
            g, jnp.asarray(pts), jnp.ones(2000, bool), jnp.asarray(sensor),
            cfg,
        )
        dropped = dropped + nd
    assert int(dropped) == 0
    assert int((np.asarray(g) > 0).sum()) > 1000


def test_origin_offset_recenters_grid(rng):
    """origin_x/origin_y shift coverage: a far cluster out of reach of the
    origin-centered grid fits a recentered one."""
    pts = np.stack(
        [1000.0 + rng.uniform(-10, 10, 1000), rng.uniform(-10, 10, 1000),
         np.full(1000, 1.0)], 1,
    ).astype(np.float32)
    sensor = np.array([1000.0, 0.0], np.float32)
    small = OccupancyGridConfig(grid_dim=256)
    g, nd = update_occupancy(
        empty_grid(small), jnp.asarray(pts), jnp.ones(1000, bool),
        jnp.asarray(sensor), small,
    )
    _, small_drop = _reference_scatter(pts, sensor, small)
    assert int(nd) == small_drop > 900 and int(np.asarray(g).sum()) == 0
    moved = OccupancyGridConfig(grid_dim=256, origin_x=1000.0)
    g2, nd2 = update_occupancy(
        empty_grid(moved), jnp.asarray(pts), jnp.ones(1000, bool),
        jnp.asarray(sensor), moved,
    )
    ref, ref_drop = _reference_scatter(pts, sensor, moved)
    assert int(nd2) == ref_drop == 0
    np.testing.assert_array_equal(np.asarray(g2), ref)
