"""Occupancy-grid mapping on device.

Replaces the reference's unbounded host hash-set of occupied cells
(slam_node.hpp:45-59, slam_node.cpp:211-229) with a fixed dense uint8 grid
centered at a configurable world origin. Out-of-bounds points are COUNTED
and returned (the hash set never drops; a dense array must — the counter
makes the truncation visible instead of silent).

The per-scan update is scatter-free: XLA's TPU scatter serializes
(~60 ns/element — ~2 ms for a 32k scan), so cells are marked by a one-hot
MATMUL instead. All in-range points land in a sensor-centered P x P patch
(P covers 2 * max_range); per-cell hit counts are

    count = onehot_x^T  @ onehot_y        # (P, N) @ (N, P) on the MXU

with bf16 one-hots (exactly representable) and f32 accumulation, and the
patch is OR-blitted into the big grid with one dynamic read-modify-write.
~0.1 ms vs ~2 ms for the scatter at 32k points.

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
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mark cells hit by one world-frame scan (slam_node.cpp:211-221).

    Returns ``(grid, n_dropped)`` — ``n_dropped`` counts in-range points
    whose cell lies outside the grid (or outside the clipped update patch
    at the grid edge); accumulate it so truncation is never silent."""
    D = config.grid_dim
    P = config.patch_dim
    res = config.resolution
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
    cx = jnp.floor((x - config.origin_x) / res).astype(jnp.int32) + D // 2
    cy = jnp.floor((y - config.origin_y) / res).astype(jnp.int32) + D // 2

    # sensor-centered patch, clipped to the grid
    sx = jnp.floor((sensor_xy[0] - config.origin_x) / res).astype(jnp.int32) + D // 2
    sy = jnp.floor((sensor_xy[1] - config.origin_y) / res).astype(jnp.int32) + D // 2
    px0 = jnp.clip(sx - P // 2, 0, D - P)
    py0 = jnp.clip(sy - P // 2, 0, D - P)
    lx = cx - px0
    ly = cy - py0
    in_patch = (lx >= 0) & (lx < P) & (ly >= 0) & (ly < P)
    n_dropped = jnp.sum(keep & ~in_patch).astype(jnp.int32)
    keep = keep & in_patch
    lx = jnp.where(keep, lx, -1)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    ohx = (lx[:, None] == lanes).astype(jnp.bfloat16)      # (N, P), 0 if dropped
    ohy = (ly[:, None] == lanes).astype(jnp.bfloat16)      # (N, P)
    count = jax.lax.dot_general(
        ohx, ohy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (P, P)
    patch = (count > 0).astype(jnp.uint8)
    region = jax.lax.dynamic_slice(grid, (px0, py0), (P, P))
    region = jnp.maximum(region, patch)
    return jax.lax.dynamic_update_slice(grid, region, (px0, py0)), n_dropped


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
        "origin_x": (minx - D // 2) * config.resolution + config.origin_x,
        "origin_y": (miny - D // 2) * config.resolution + config.origin_y,
        "data": data,
    }
