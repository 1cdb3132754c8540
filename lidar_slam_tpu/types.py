"""Core pytree types.

The reference represents a point cloud as a dynamically-sized Nx3 Eigen matrix
(``types.hpp:15-61``) and a rigid transform as a 4x4 homogeneous matrix class
(``types.hpp:74-136``). TPU-natively, a point cloud is a fixed-shape padded
``(N, 3)`` float32 array plus a boolean validity mask, and transforms are raw
``(4, 4)`` arrays manipulated by the free functions in :mod:`lidar_slam_tpu.ops.se3`
— everything is a pytree so it flows through jit/vmap/scan unchanged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class PointCloud(NamedTuple):
    """Padded point cloud: ``points[i]`` is valid iff ``mask[i]``.

    Mirrors the capability of reference ``types.hpp:15-61`` (size/centroid/
    centered are provided as methods over masked data).
    """

    points: jnp.ndarray  # (N, 3) float32
    mask: jnp.ndarray    # (N,)  bool

    @property
    def capacity(self) -> int:
        return self.points.shape[-2]

    def count(self) -> jnp.ndarray:
        """Number of valid points (traced scalar)."""
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    def centroid(self) -> jnp.ndarray:
        """Masked centroid (reference types.hpp:44-46)."""
        w = self.mask.astype(self.points.dtype)[..., None]
        denom = jnp.maximum(jnp.sum(w, axis=-2), 1.0)
        return jnp.sum(self.points * w, axis=-2) / denom

    def centered(self) -> "PointCloud":
        """Centroid-at-origin copy (reference types.hpp:49-52)."""
        return PointCloud(self.points - self.centroid()[..., None, :], self.mask)

    def subsample(self, n_out: int) -> "PointCloud":
        """Deterministic strided subsample of the valid prefix.

        Valid points first (contiguous after voxel downsampling), evenly
        strided so spatial coverage is preserved — a prefix slice would be
        spatially biased, because voxel output is sorted by packed voxel
        key. The single shared implementation behind ICP source/target
        subsampling, the loop-closure DB cloud cap, and the blocked global-
        map assembly."""
        if n_out >= self.capacity:
            return self
        idx = strided_prefix_idx(self.count(), n_out)
        return PointCloud(self.points[idx], self.mask[idx])

    @staticmethod
    def from_numpy(pts: np.ndarray, capacity: int) -> "PointCloud":
        """Pad a host (n,3) array to ``capacity`` rows with a validity mask."""
        n = min(pts.shape[0], capacity)
        out = np.zeros((capacity, 3), np.float32)
        out[:n] = pts[:n]
        mask = np.zeros((capacity,), bool)
        mask[:n] = True
        return PointCloud(jnp.asarray(out), jnp.asarray(mask))


def strided_prefix_idx(cnt: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Indices of an evenly-strided ``n_out``-subsample of a valid prefix.

    ``cnt`` is the valid-prefix length — a traced scalar, or any batched
    shape (a trailing axis is added for broadcasting, so a ``(B,)`` count
    vector yields ``(B, n_out)`` row indices). When ``cnt <= n_out`` the
    first ``n_out`` rows are returned unchanged (identity gather over the
    padded region)."""
    j = jnp.arange(n_out)
    c = jnp.asarray(cnt)[..., None]
    return jnp.where(c > n_out, (j * c) // n_out, j).astype(jnp.int32)


class ICPResult(NamedTuple):
    """Registration result (mirrors reference types.hpp:155-164).

    ``error_history`` is a fixed ``(max_iterations + 1,)`` array; entries at
    index >= ``num_iterations + 1`` are zero padding.
    ``converged`` is False when the iteration budget was exhausted without an
    early break — matching the reference's quirk (icp.hpp:210-217).
    """

    transformation: jnp.ndarray   # (4, 4)
    converged: jnp.ndarray        # () bool
    num_iterations: jnp.ndarray   # () int32
    error_history: jnp.ndarray    # (max_iterations + 1,)
    final_error: jnp.ndarray      # ()

    def success(self) -> jnp.ndarray:
        """converged AND final_error < 0.1 (reference types.hpp:163)."""
        return jnp.logical_and(self.converged, self.final_error < 0.1)
