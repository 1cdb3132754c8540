"""Slab-pruned nearest-neighbor search (gather-free spatial pruning).

The TPU-native answer to the KD-tree's O(log n) pruning that actually fits
the hardware: clouds leave the voxel downsampler sorted by packed voxel key,
which is x-major — so points consecutive in memory are consecutive in x. For
a tile of TS consecutive source points, every target within ``margin`` of the
tile lies in ONE CONTIGUOUS RANGE of the sorted target array. Each tile's
search is a dynamic_slice (sequential DMA, no gather) of a fixed window W
followed by dense VPU distance math:

    cost = S * W   instead of   S * T      (W = T/4 .. T/8)

The window start per tile comes from a vectorized binary search on the
target x-coordinates. Exact whenever the true NN is within ``margin`` of the
query in x (misses degrade to a farther correspondence, which point-to-plane
ICP tolerates — same contract as grid_nn).

Requires both clouds x-major sorted (ops/voxel.py output order; the native
host voxelizer sorts identically). Padding rows sit at the tail.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


from .knn import SENTINEL
from .grid_nn import _searchsorted_left


@functools.partial(jax.jit, static_argnames=("ts", "window"))
def nn1_slab(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    ts: int = 256,
    window: int = 4096,
    margin: float = 3.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """1-NN with x-slab pruning. Same contract as ops.knn.nn1.

    ``ts``: source tile size; ``window``: contiguous target candidates per
    tile; ``margin``: x-slack (m) the window start backs off by — bounds the
    correspondence distance for which the search is exact.
    """
    S = src.shape[0]
    T = tgt.shape[0]
    ts = min(ts, S)
    while S % ts:
        ts -= 1
    window = min(window, T)

    tgt_m = jnp.where(tgt_mask[:, None], tgt, SENTINEL)
    # Key-sorted order is x-monotone only at voxel granularity (within one
    # x-slab points are ordered by y/z). Binary-search over the running max
    # of x: it is monotone and >= x everywhere, so the found start is safe
    # (earlier-or-equal to every candidate).
    tgt_x_mono = jax.lax.cummax(tgt_m[:, 0])

    tiles = src.reshape(S // ts, ts, 3)
    # invalid source rows are harmless: they query real windows and their
    # results are discarded by downstream masking
    tile_min_x = jnp.min(tiles[:, :, 0], axis=1) - margin
    starts = _searchsorted_left(tgt_x_mono, tile_min_x).astype(jnp.int32)
    starts = jnp.clip(starts, 0, max(T - window, 0))

    def per_tile(carry, inputs):
        tile, start = inputs
        win = jax.lax.dynamic_slice_in_dim(tgt_m, start, window)  # (W, 3)
        dx = tile[:, 0:1] - win[None, :, 0].reshape(1, -1)
        dy = tile[:, 1:2] - win[None, :, 1].reshape(1, -1)
        dz = tile[:, 2:3] - win[None, :, 2].reshape(1, -1)
        d2 = dx * dx + dy * dy + dz * dz                          # (ts, W)
        loc = jnp.argmin(d2, axis=1)
        best = jnp.take_along_axis(d2, loc[:, None], axis=1)[:, 0]
        return carry, (loc.astype(jnp.int32) + start, best)

    _, (idx, d2) = jax.lax.scan(per_tile, None, (tiles, starts))
    return idx.reshape(S), d2.reshape(S)
