"""Device-side voxel-grid downsampling with fixed output shape.

Replaces the reference's host hash-map implementation (file_utils.cpp:148-196:
floor(p / voxel) key -> bucket -> centroid). TPU-natively, the hash map becomes
sort-based segmentation: quantize each point to a packed int32 voxel key, sort,
detect segment starts, and scatter-add points into dense output slots — all
static shapes, all on device.

Key packing uses 10 bits per axis, so coordinates must lie within
±511 * voxel_size of the origin (±255 m at the default 0.5 m voxel — beyond
any LiDAR return in sensor frame). Out-of-range points are clamped.

The set of output centroids matches the reference exactly; ordering differs
(sorted by voxel key vs. unordered_map iteration order), which no consumer
depends on. If more than ``out_size`` voxels are occupied, an evenly strided
subset over the key-sorted uniques is kept — strided-over-sorted is spatially
uniform (a sorted-prefix cut would keep only the low-x slab of the scene and
poison ICP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..types import PointCloud

_AXIS_BITS = 10
_AXIS_OFF = 1 << (_AXIS_BITS - 1)  # 512
_AXIS_MAX = (1 << _AXIS_BITS) - 1  # 1023
_INVALID_KEY = jnp.int32(2**31 - 1)


@functools.partial(jax.jit, static_argnames=("out_size",))
def voxel_downsample(
    pts: jnp.ndarray,
    mask: jnp.ndarray,
    voxel_size: jnp.ndarray | float,
    out_size: int,
) -> PointCloud:
    """Centroid-per-voxel downsample of a padded cloud.

    Args:
      pts: (N, 3) float32 padded points.
      mask: (N,) bool validity.
      voxel_size: scalar; if <= 0 the input passes through (truncated/padded
        to ``out_size``) — reference pass-through at file_utils.cpp:153.
      out_size: static output capacity.

    Returns:
      PointCloud with (out_size, 3) centroids + mask.
    """
    N = pts.shape[0]
    voxel_size = jnp.asarray(voxel_size, pts.dtype)
    vs = jnp.where(voxel_size > 0, voxel_size, 1.0)

    q = jnp.floor(pts / vs).astype(jnp.int32) + _AXIS_OFF
    q = jnp.clip(q, 0, _AXIS_MAX)
    key = (q[:, 0] << (2 * _AXIS_BITS)) | (q[:, 1] << _AXIS_BITS) | q[:, 2]
    key = jnp.where(mask, key, _INVALID_KEY)

    order = jnp.argsort(key)
    key_s = key[order]
    pts_s = pts[order]
    valid_s = key_s != _INVALID_KEY

    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), key_s[1:] != key_s[:-1]]
    ) & valid_s
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # unique-voxel id per point
    n_unique = jnp.sum(is_start.astype(jnp.int32))

    # Scatter per-voxel sums into an N-slot buffer (up to N unique voxels),
    # then gather an evenly strided out_size subset (spatially uniform when
    # over capacity — uniques are key-sorted).
    slot = jnp.where(valid_s, seg, N)
    sums = jnp.zeros((N + 1, 3), pts.dtype).at[slot].add(pts_s)
    counts = jnp.zeros((N + 1,), pts.dtype).at[slot].add(1.0)
    j = jnp.arange(out_size)
    pick = jnp.where(
        n_unique > out_size, (j * n_unique) // out_size, j
    ).astype(jnp.int32)
    centroids = sums[pick] / jnp.maximum(counts[pick], 1.0)[:, None]
    out_mask = jnp.arange(out_size) < jnp.minimum(n_unique, out_size)

    # voxel_size <= 0: pass through raw points (file_utils.cpp:153).
    passthrough = voxel_size <= 0
    raw_pts = pts[:out_size] if N >= out_size else jnp.pad(pts, ((0, out_size - N), (0, 0)))
    raw_mask = mask[:out_size] if N >= out_size else jnp.pad(mask, (0, out_size - N))
    out_pts = jnp.where(passthrough, raw_pts, centroids)
    out_mask = jnp.where(passthrough, raw_mask, out_mask)
    return PointCloud(jnp.where(out_mask[:, None], out_pts, 0.0), out_mask)
