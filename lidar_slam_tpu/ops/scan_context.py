"""Scan Context place-recognition descriptor, TPU-native.

Replaces the reference's per-point binning loop and O(shifts x rings x sectors)
pairwise distance (scan_context.hpp:44-82, :90-102, :121-142). TPU-natively:

- descriptor build = one masked scatter-max over flattened bin ids,
- database search = ONE matmul: the 60 column-rolled copies of the query
  (60, rings*sectors) against the stacked descriptor DB (rings*sectors, F) on
  the MXU, then a max over shifts — instead of 60 x F separate passes.

Semantics match the reference exactly: polar binning over range in
[0.1, 80] m, max-z per bin, empty bins = 0, distance = min over all column
shifts of (1 - cosine similarity) on the full flattened descriptor, and
distance 1.0 when either norm < 1e-10 (scan_context.hpp:137-138).

``ring_key`` / ``sector_key`` (scan_context.hpp:107-116 — declared but dead in
the reference) are implemented and *used* when ``ring_key_prefilter`` is on.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import ScanContextConfig

_NEG = -1.0e9  # stands in for -inf in the scatter-max init


@functools.partial(jax.jit, static_argnames=("config",))
def scan_context(
    pts: jnp.ndarray, mask: jnp.ndarray, config: ScanContextConfig = ScanContextConfig()
) -> jnp.ndarray:
    """(rings, sectors) max-height descriptor of a padded cloud."""
    R, S = config.num_rings, config.num_sectors
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    rng = jnp.sqrt(x * x + y * y)
    ang = jnp.arctan2(y, x) + jnp.pi  # [0, 2pi] (scan_context.hpp:57)
    valid = mask & (rng <= config.max_range) & (rng >= config.min_range)

    ring_size = config.max_range / R
    sector_size = 2.0 * jnp.pi / S
    ring = jnp.clip((rng / ring_size).astype(jnp.int32), 0, R - 1)
    sector = jnp.clip((ang / sector_size).astype(jnp.int32), 0, S - 1)
    bin_id = jnp.where(valid, ring * S + sector, R * S)  # dump slot for invalid

    # Tiled masked-max instead of scatter-max: XLA's TPU scatter serializes
    # per element. A scan over point tiles computes each tile's (T, R*S)
    # one-hot compare + max-reduce on the VPU — identical semantics, no
    # serialized writes. Measured at N=32k on v5e: 0.54 ms vs 0.75 ms
    # scatter-max (T=2048 and T=8192 tie; T=256 is scan-overhead bound at
    # 8 ms, and the single fused (N, C) reduce is equally bad).
    C = R * S
    zval = jnp.where(valid, z, _NEG)
    N = bin_id.shape[0]
    T = min(2048, N)
    pad = (-N) % T
    if pad:
        bin_id = jnp.concatenate([bin_id, jnp.full((pad,), C, jnp.int32)])
        zval = jnp.concatenate([zval, jnp.full((pad,), _NEG, zval.dtype)])
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

    def tile_max(acc, inp):
        b, zv = inp  # (T,), (T,)
        m = b[:, None] == lanes  # (T, C); the C dump bin matches no lane
        return jnp.maximum(
            acc, jnp.max(jnp.where(m, zv[:, None], _NEG), axis=0)
        ), None

    desc, _ = jax.lax.scan(
        tile_max,
        jnp.full((C,), _NEG, pts.dtype),
        (bin_id.reshape(-1, T), zval.reshape(-1, T)),
    )
    # Empty bins -> 0; reference treats any value < -1000 as empty
    # (scan_context.hpp:75-81).
    desc = jnp.where(desc < -1000.0, 0.0, desc)
    return desc.reshape(R, S)


def ring_key(desc: jnp.ndarray) -> jnp.ndarray:
    """Row-wise mean over sectors (scan_context.hpp:107-109)."""
    return jnp.mean(desc, axis=-1)


def sector_key(desc: jnp.ndarray) -> jnp.ndarray:
    """Column-wise mean over rings (scan_context.hpp:113-116)."""
    return jnp.mean(desc, axis=-2)


def _rolled_queries(desc: jnp.ndarray) -> jnp.ndarray:
    """(S, R*S): query rolled right by each shift s, flattened.

    The reference compares a(i,j) against b(i, (j+shift) % S)
    (scan_context.hpp:129); dot(a, roll(b, -s)) == dot(roll(a, +s), b), so
    rolling the query right by s reproduces shifting the DB entry left by s.
    """
    S = desc.shape[-1]
    shifts = jnp.arange(S)
    rolled = jax.vmap(lambda s: jnp.roll(desc, s, axis=-1))(shifts)  # (S, R, S)
    return rolled.reshape(S, -1)


@jax.jit
def sc_distances(
    query: jnp.ndarray, db: jnp.ndarray, db_norm: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Distance of one query descriptor to every DB entry.

    Args:
      query: (R, S) descriptor.
      db: (F, R, S) stacked descriptors (padding entries are all-zero).
      db_norm: (F,) Frobenius norms of the DB entries.

    Returns:
      (dist (F,), best_shift (F,) int32): min over shifts of 1 - cosine
      similarity, and the argmin shift (usable as a yaw seed — an improvement
      the reference leaves on the table, SURVEY.md quirk #8).
    """
    S = query.shape[-1]
    F = db.shape[0]
    q = _rolled_queries(query)                      # (S, R*S)
    flat_db = db.reshape(F, -1)                     # (F, R*S)
    dots = jnp.matmul(q, flat_db.T, precision=jax.lax.Precision.HIGHEST)  # (S, F)
    qn = jnp.sqrt(jnp.sum(query * query))
    norm = qn * db_norm                             # (F,)
    sims = dots / jnp.maximum(norm, 1e-30)[None, :]
    best_shift = jnp.argmax(sims, axis=0).astype(jnp.int32)
    best_sim = jnp.max(sims, axis=0)
    dist = 1.0 - best_sim
    # Either norm < 1e-10 -> distance 1.0 (scan_context.hpp:137-138).
    dist = jnp.where(norm < 1e-10, 1.0, dist)
    return dist, best_shift


@functools.partial(jax.jit, static_argnames=("k",))
def sc_distances_ring_prefiltered(
    query: jnp.ndarray,
    db: jnp.ndarray,
    db_norm: jnp.ndarray,
    k: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two-stage retrieval: ring-key L1 prefilter -> full shifted-cosine on
    the top-k survivors only.

    Resurrects the reference's dead ring_key API (scan_context.hpp:107-109 —
    declared, never called; SURVEY.md quirk #3) as the original Scan Context
    paper intends: the ring key is rotation-invariant by construction, so the
    cheap (F, R) L1 distance safely prunes before the 60-shift search.
    Returns (dist (F,), best_shift (F,)) with non-survivors at +inf / 0.
    """
    F = db.shape[0]
    qrk = ring_key(query)                       # (R,)
    rks = jnp.mean(db, axis=-1)                 # (F, R)
    l1 = jnp.sum(jnp.abs(rks - qrk[None, :]), axis=-1)
    _, idx = jax.lax.top_k(-l1, k)              # k nearest ring keys
    d_k, s_k = sc_distances(query, db[idx], db_norm[idx])
    dist = jnp.full((F,), jnp.inf, query.dtype).at[idx].set(d_k)
    shift = jnp.zeros((F,), jnp.int32).at[idx].set(s_k)
    return dist, shift


def sc_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise distance of two descriptors (reference scan_context.hpp:90-102)."""
    d, _ = sc_distances(a, b[None], jnp.sqrt(jnp.sum(b * b))[None])
    return d[0]


def shift_to_yaw(shift: jnp.ndarray, num_sectors: int) -> jnp.ndarray:
    """Convert a best column shift into a relative yaw angle (radians)."""
    s = shift.astype(jnp.float32)
    half = num_sectors / 2.0
    s = jnp.where(s > half, s - num_sectors, s)
    return s * (2.0 * jnp.pi / num_sectors)
