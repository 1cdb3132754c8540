"""Multi-chip sharded nearest-neighbor search.

The 128k-point dense-cloud config (BASELINE.md ladder #5) exceeds what one
chip should spend per scan on the O(S*T) correspondence search; this module
shards it across a mesh with XLA collectives over ICI:

- :func:`nn1_target_sharded` — target rows sharded over ``axis``; each device
  computes a local (min, argmin) against its shard, then an ``all_gather`` +
  reduction picks the global winner. This is the reduction shape of the
  blockwise-streaming accumulator (SURVEY.md §2) lifted across chips.
- :func:`nn1_source_sharded` — source rows sharded; no cross-device reduction
  (each source row's search is independent); one device-local pass, results
  concatenated by the runtime.

Both return replicated / naturally-sharded outputs with the same contract as
ops.knn.nn1.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import functools

from jax.sharding import Mesh, PartitionSpec as P

# jax.shard_map is the stable API (>= 0.8); the jax.experimental.shard_map
# module is deprecated and slated for removal. check_vma=False replaces the
# old check_rep=False (our outputs are device-identical by construction, but
# the all_gather+argmin combine is opaque to the replication checker).
shard_map = functools.partial(jax.shard_map, check_vma=False)

from ..ops.knn import nn1


def nn1_target_sharded(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    mesh: Mesh,
    axis: str = "pts",
):
    """1-NN with the target cloud sharded over ``axis`` (collective combine)."""
    nshards = mesh.shape[axis]
    T = tgt.shape[0]
    assert T % nshards == 0, (T, nshards)
    shard = T // nshards

    def local(src_, tgt_, mask_):
        idx, d2 = nn1(src_, tgt_, mask_)
        my = jax.lax.axis_index(axis)
        idx = idx + my * shard
        d2_all = jax.lax.all_gather(d2, axis)    # (nshards, S)
        idx_all = jax.lax.all_gather(idx, axis)  # (nshards, S)
        best = jnp.argmin(d2_all, axis=0)
        pick = lambda a: jnp.take_along_axis(a, best[None, :], axis=0)[0]
        return pick(idx_all), pick(d2_all)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P()),
    )
    return fn(src, tgt, tgt_mask)


def nn1_source_sharded(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    mesh: Mesh,
    axis: str = "pts",
):
    """1-NN with source rows sharded over ``axis`` (no collectives; the
    target is replicated). Output stays sharded over ``axis``."""
    nshards = mesh.shape[axis]
    assert src.shape[0] % nshards == 0

    def local(src_, tgt_, mask_):
        return nn1(src_, tgt_, mask_)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=(P(axis), P(axis)),
    )
    return fn(src, tgt, tgt_mask)


def make_sharded_nn1(mesh: Mesh, axis: str = "pts"):
    """nn1_fn adapter for icp_point_to_plane: collective target-sharded search
    usable INSIDE an outer shard_map whose mesh axes include ``axis`` (inputs
    replicated over that axis). Slices the target shard locally, searches it,
    and combines with an all_gather over ``axis``."""
    nshards = mesh.shape[axis]

    def nn1_fn(src_, tgt_, mask_):
        T = tgt_.shape[0]
        shard = T // nshards
        my = jax.lax.axis_index(axis)
        tl = jax.lax.dynamic_slice_in_dim(tgt_, my * shard, shard)
        ml = jax.lax.dynamic_slice_in_dim(mask_, my * shard, shard)
        idx, d2 = nn1(src_, tl, ml)
        idx = idx + my * shard
        d2_all = jax.lax.all_gather(d2, axis)
        idx_all = jax.lax.all_gather(idx, axis)
        best = jnp.argmin(d2_all, axis=0)
        pick = lambda a: jnp.take_along_axis(a, best[None, :], axis=0)[0]
        return pick(idx_all), pick(d2_all)

    return nn1_fn
