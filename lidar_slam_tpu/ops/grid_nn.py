"""Sorted-grid windowed nearest-neighbor search.

The brute-force 1-NN (ops/knn.py, ops/knn_pallas.py) does O(S*T) distance
work — the VPU runs it well, but at 16k x 16k it is still ~1.5 ms per ICP
iteration. This module is the TPU-native analog of the reference KD-tree's
O(log n) pruning (kdtree.hpp:112-142): prune by *spatial cell*, not by tree
traversal.

- The target cloud is sorted once per scan by a packed (cx, cy, cz) cell key
  (cell size a small multiple of the voxel size).
- Each query probes its 3x3 neighboring (cx, cy) cells at cz-1: a vectorized
  binary search (jnp.searchsorted) finds the window start, and a fixed run of
  W sorted entries per probe covers the czplus/minus1 z-range.
- True distances to the 9W gathered candidates are compared exactly; the
  argmin gives the neighbor.

The search is exact whenever the true NN lies within +-1 cell of the query
(guaranteed if the NN distance < cell size); a miss degrades gracefully to a
farther correspondence, which point-to-plane ICP tolerates. All shapes are
static; cost is O(S * (9 log T + 9W)) instead of O(S*T).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .knn import SENTINEL

_BITS = 10
_OFF = 1 << (_BITS - 1)
_MAXQ = (1 << _BITS) - 1


class SortedGrid(NamedTuple):
    """Per-scan acceleration structure (replaces the per-scan KD-tree build)."""

    points: jnp.ndarray   # (T, 3) cell-key-sorted, invalid at SENTINEL
    keys: jnp.ndarray     # (T,) sorted packed keys (int32)
    order: jnp.ndarray    # (T,) original index per sorted slot
    cell: jnp.ndarray     # () cell size


def _quantize(pts: jnp.ndarray, cell) -> jnp.ndarray:
    q = jnp.floor(pts / cell).astype(jnp.int32) + _OFF
    return jnp.clip(q, 0, _MAXQ)


def _pack(q: jnp.ndarray) -> jnp.ndarray:
    return (q[..., 0] << (2 * _BITS)) | (q[..., 1] << _BITS) | q[..., 2]


def build_grid(pts: jnp.ndarray, mask: jnp.ndarray, cell) -> SortedGrid:
    """Sort the cloud by packed cell key (once per scan, ~1 ms at 16k)."""
    cell = jnp.asarray(cell, pts.dtype)
    pts_m = jnp.where(mask[:, None], pts, SENTINEL)
    key = jnp.where(mask, _pack(_quantize(pts_m, cell)), jnp.int32(2**31 - 1))
    order = jnp.argsort(key)
    return SortedGrid(
        points=pts_m[order],
        keys=key[order],
        order=order.astype(jnp.int32),
        cell=cell,
    )


def _searchsorted_left(keys: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """Vectorized binary search (left insertion point).

    ``jnp.searchsorted`` lowers to a sequential scan on this TPU backend;
    an unrolled log2(T)-step gather loop is fast and fully vectorized."""
    T = keys.shape[0]
    steps = max(int(np.ceil(np.log2(max(T, 2)))), 1)
    lo = jnp.zeros(queries.shape, jnp.int32)
    hi = jnp.full(queries.shape, T, jnp.int32)
    for _ in range(steps):
        mid = (lo + hi) // 2
        v = keys[jnp.minimum(mid, T - 1)]
        go_right = v < queries
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


@functools.partial(jax.jit, static_argnames=("window",))
def nn1_grid(
    src: jnp.ndarray,
    grid: SortedGrid,
    window: int = 32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """1-NN of (S, 3) queries in the sorted grid.

    Returns (idx into the ORIGINAL target ordering, squared distance) —
    the same contract as ops.knn.nn1.
    """
    S = src.shape[0]
    T = grid.points.shape[0]
    qs = _quantize(src, grid.cell)

    # 9 probes: (dx, dy) in {-1,0,1}^2, starting at cz-1
    d = jnp.array(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], jnp.int32
    )  # (9, 2)
    probe_q = jnp.stack(
        [
            jnp.clip(qs[:, None, 0] + d[None, :, 0], 0, _MAXQ),
            jnp.clip(qs[:, None, 1] + d[None, :, 1], 0, _MAXQ),
            jnp.clip(qs[:, None, 2] - 1, 0, _MAXQ)
            * jnp.ones((1, 9), jnp.int32),
        ],
        axis=-1,
    )  # (S, 9, 3)
    probe_key = _pack(probe_q)  # (S, 9)

    pos = _searchsorted_left(grid.keys, probe_key.reshape(-1)).reshape(S, 9)
    cand = pos[:, :, None] + jnp.arange(window, dtype=jnp.int32)[None, None, :]
    cand = jnp.minimum(cand, T - 1).reshape(S, 9 * window)

    cpts = grid.points[cand]                       # (S, 9W, 3)
    diff = cpts - src[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)             # (S, 9W)
    best = jnp.argmin(d2, axis=1)
    best_d2 = jnp.take_along_axis(d2, best[:, None], axis=1)[:, 0]
    best_slot = jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0]
    return grid.order[best_slot], best_d2


def make_grid_corr_fn(tgt_pts: jnp.ndarray, tgt_mask: jnp.ndarray,
                      cell, window: int = 32):
    """Build the grid once and return an ``nn1_fn``-compatible closure for
    icp_point_to_plane (the tgt/tgt_mask arguments are ignored — the bound
    grid IS the target)."""
    grid = build_grid(tgt_pts, tgt_mask, cell)

    def nn1_fn(src, _tgt, _mask):
        return nn1_grid(src, grid, window=window)

    return nn1_fn


def make_grid_backend(cell: float, window: int = 32):
    """ICP-injectable grid backend (see icp_point_to_plane's ``nn1_fn``).

    Carries a ``prepare`` attribute so the grid (the sort) is built once per
    ICP call — the TPU analog of the reference's per-call KD-tree build
    (icp.hpp:166) — and queried every iteration."""

    def nn1_fn(src, tgt, mask):
        return nn1_grid(src, build_grid(tgt, mask, cell), window=window)

    def prepare(tgt, mask):
        grid = build_grid(tgt, mask, cell)
        return lambda src: nn1_grid(src, grid, window=window)

    nn1_fn.prepare = prepare
    return nn1_fn
