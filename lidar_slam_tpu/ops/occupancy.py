"""Occupancy-grid mapping on device.

Replaces the reference's unbounded host hash-set of occupied cells
(slam_node.hpp:45-59, slam_node.cpp:211-229) with a fixed dense uint8 grid
centered at the world origin: a masked scatter marks cells, so per-frame
updates are one fused device op instead of a host loop.

Filter semantics match slam_node.cpp:211-221: keep world points with
z in [height_min, height_max] and horizontal distance to the sensor in
(min_range, max_range]; cell = floor(xy / resolution).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import OccupancyGridConfig


def empty_grid(config: OccupancyGridConfig) -> jnp.ndarray:
    return jnp.zeros((config.grid_dim, config.grid_dim), jnp.uint8)


@functools.partial(jax.jit, static_argnames=("config",))
def update_occupancy(
    grid: jnp.ndarray,
    world_pts: jnp.ndarray,
    mask: jnp.ndarray,
    sensor_xy: jnp.ndarray,
    config: OccupancyGridConfig = OccupancyGridConfig(),
) -> jnp.ndarray:
    """Mark cells hit by one world-frame scan (slam_node.cpp:211-221)."""
    D = config.grid_dim
    x, y, z = world_pts[:, 0], world_pts[:, 1], world_pts[:, 2]
    dx, dy = x - sensor_xy[0], y - sensor_xy[1]
    r = jnp.sqrt(dx * dx + dy * dy)
    keep = (
        mask
        & (z >= config.height_min)
        & (z <= config.height_max)
        & (r <= config.max_range)
        & (r >= config.min_range)
    )
    cx = jnp.floor(x / config.resolution).astype(jnp.int32) + D // 2
    cy = jnp.floor(y / config.resolution).astype(jnp.int32) + D // 2
    in_grid = (cx >= 0) & (cx < D) & (cy >= 0) & (cy < D)
    keep = keep & in_grid
    # invalid -> write the (0,0)-corner with value 0 (no-op via max with 0)
    cx = jnp.where(keep, cx, 0)
    cy = jnp.where(keep, cy, 0)
    val = keep.astype(jnp.uint8)
    return grid.at[cx, cy].max(val)


def grid_to_message(grid, config: OccupancyGridConfig):
    """Crop to the occupied bounding box + 5-cell margin, occupied = 100
    (reference cells_to_occupancy_grid_msg, slam_node.cpp:279-297).

    Host-side (NumPy) — used only for artifact export.
    """
    import numpy as np

    g = np.asarray(grid)
    occ = np.argwhere(g > 0)
    if occ.size == 0:
        return {
            "resolution": config.resolution,
            "width": 0,
            "height": 0,
            "origin_x": 0.0,
            "origin_y": 0.0,
            "data": np.zeros((0, 0), np.int8),
        }
    D = config.grid_dim
    minx, miny = occ.min(axis=0) - 5
    maxx, maxy = occ.max(axis=0) + 5
    minx, miny = max(minx, 0), max(miny, 0)
    maxx, maxy = min(maxx, D - 1), min(maxy, D - 1)
    crop = g[minx : maxx + 1, miny : maxy + 1]
    data = np.where(crop > 0, 100, 0).astype(np.int8)
    return {
        "resolution": config.resolution,
        "width": data.shape[0],
        "height": data.shape[1],
        "origin_x": (minx - D // 2) * config.resolution,
        "origin_y": (miny - D // 2) * config.resolution,
        "data": data,
    }
