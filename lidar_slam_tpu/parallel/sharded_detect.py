"""Multi-chip sharded Scan-Context retrieval.

The loop-closure DB search cost grows linearly with the keyframe count
(reference: a serial linear scan, loop_closure.hpp:78-89; here: one
60-rolled-query matmul against the stacked DB, ops/scan_context.py). At
multi-sequence or city scale the DB outgrows one chip's slice of time;
this module shards the DB (keyframe) axis over a mesh — SURVEY.md §2's
"DB retrieval matmul sharded over keyframe axis" plan:

- each device runs the full shifted-cosine retrieval against its DB shard
  (pure local matmuls on the MXU),
- per-shard top-k candidates are reduced with ONE ``all_gather`` of
  (k, ) distances + global indices per shard — communication is O(k *
  n_devices), independent of the DB size (the naive alternative gathers
  the full (F,) distance vector).

Exact: top-k of a concatenation equals top-k of the per-shard top-k union.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.scan_context import sc_distances

# see parallel/sharded_knn.py for the check_vma note
shard_map = functools.partial(jax.shard_map, check_vma=False)


def sc_topk_sharded(
    query: jnp.ndarray,
    db: jnp.ndarray,
    db_norm: jnp.ndarray,
    k: int,
    mesh: Mesh,
    axis: str = "pts",
):
    """Top-k Scan-Context candidates with the DB sharded over ``axis``.

    Args:
      query: (R, S) descriptor (replicated).
      db: (F, R, S) stacked descriptors, F divisible by the axis size.
      db_norm: (F,) Frobenius norms.
      k: candidates to return (global).
      mesh: device mesh.
      axis: mesh axis to shard the keyframe dimension over.

    Returns:
      (dist (k,), idx (k,), shift (k,)): ascending global top-k distances,
      their DB indices, and the best yaw shift per candidate — identical to
      a single-device ``sc_distances`` + top-k (padding/empty entries carry
      distance 1.0 like the reference, scan_context.hpp:137-138).
    """
    nshards = mesh.shape[axis]
    F = db.shape[0]
    assert F % nshards == 0, (F, nshards)
    shard = F // nshards
    k_local = min(k, shard)

    def local(query_, db_, dbn_):
        dist, shift = sc_distances(query_, db_, dbn_)
        # per-shard top-k (ascending distance): comm is O(k), not O(F)
        neg, loc = jax.lax.top_k(-dist, k_local)
        my = jax.lax.axis_index(axis)
        gidx = loc.astype(jnp.int32) + my * shard
        cand = jnp.stack(
            [-neg, gidx.astype(jnp.float32),
             shift[loc].astype(jnp.float32)], axis=0
        )                                             # (3, k_local)
        allc = jax.lax.all_gather(cand, axis)         # (nshards, 3, k_local)
        d_all = allc[:, 0, :].reshape(-1)
        i_all = allc[:, 1, :].reshape(-1)
        s_all = allc[:, 2, :].reshape(-1)
        negk, sel = jax.lax.top_k(-d_all, min(k, d_all.shape[0]))
        return (-negk, i_all[sel].astype(jnp.int32),
                s_all[sel].astype(jnp.int32))

    fn = shard_map(
        local,
        mesh=mesh,
        # query replicated; db/db_norm sharded on the keyframe (leading)
        # axis; outputs replicated (every device computes the same global
        # reduction from the gathered candidates).
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
    )
    return fn(query, db, db_norm)
