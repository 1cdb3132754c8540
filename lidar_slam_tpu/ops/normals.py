"""Batched PCA surface-normal estimation.

Replaces the reference's per-point loop (icp.hpp:23-67: k-NN -> neighbor
covariance -> Eigen SelfAdjointEigenSolver -> smallest-eigenvalue eigenvector,
z-oriented). TPU-natively all N points are processed at once: one k-NN sweep,
a batched (N, 3, 3) covariance build, and a closed-form analytic 3x3 symmetric
eigensolver (trigonometric method) instead of an iterative eigh — the analytic
form is branch-free and runs entirely on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .knn import knn

_EPS = 1e-12


def smallest_eigvec_3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of symmetric (…, 3, 3) A.

    Analytic eigenvalues via the trigonometric method; eigenvector via cross
    products of rows of (A - lambda_min I) (the null-space direction), picking
    the largest-magnitude cross product for stability.
    """
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]

    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, _EPS))

    # r = det((A - qI) / p) / 2, clipped into acos domain.
    b00, b11, b22 = (a00 - q) / p, (a11 - q) / p, (a22 - q) / p
    b01, b02, b12 = a01 / p, a02 / p, a12 / p
    detB = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    # Null-space direction of (A - lam_min I): cross products of its rows.
    M = A - lam_min[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.argmax(jnp.stack([n01, n02, n12], axis=-1), axis=-1)
    cands = jnp.stack([c01, c02, c12], axis=-2)  # (…, 3, 3)
    v = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    nrm = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    # Degenerate (isotropic / zero) neighborhoods: fall back to +z
    fallback = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], A.dtype), v.shape)
    ok = nrm[..., 0] > 1e-10
    return jnp.where(ok[..., None], v / jnp.maximum(nrm, _EPS), fallback)


@functools.partial(jax.jit, static_argnames=("k", "chunk", "exact"))
def estimate_normals(
    pts: jnp.ndarray,
    mask: jnp.ndarray,
    k: int = 20,
    chunk: int = 2048,
    exact: bool = False,
) -> jnp.ndarray:
    """Per-point surface normals of a padded cloud (mirrors icp.hpp:23-67).

    - k nearest neighbors within the same cloud (self included, as in the
      reference tree query),
    - covariance of valid neighbors about their centroid,
    - smallest-eigenvalue eigenvector, flipped so normal.z >= 0,
    - rows with < 3 valid neighbors (or invalid rows) get (0, 0, 1)
      (reference fallback icp.hpp:34-37).

    Neighbor search defaults to approximate top-k (TPU partial reduction);
    PCA over ~20 neighbors is insensitive to occasional rank swaps.
    """
    idx, _ = knn(pts, pts, mask, k=k, chunk=chunk, exact=exact)
    nbr = pts[idx]                       # (N, k, 3)
    w = mask[idx].astype(pts.dtype)      # (N, k) neighbor validity
    cnt = jnp.sum(w, axis=-1)            # (N,)
    cnt_safe = jnp.maximum(cnt, 1.0)

    centroid = jnp.sum(nbr * w[..., None], axis=-2) / cnt_safe[..., None]
    d = (nbr - centroid[..., None, :]) * w[..., None]
    cov = jnp.einsum(
        "nki,nkj->nij", d, d, precision=jax.lax.Precision.HIGHEST
    ) / cnt_safe[..., None, None]

    n = smallest_eigvec_3x3(cov)
    n = jnp.where(n[..., 2:3] < 0, -n, n)  # orient +z (icp.hpp:59-61)

    degenerate = (cnt < 3.0) | ~mask
    up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], pts.dtype), n.shape)
    return jnp.where(degenerate[..., None], up, n)


@functools.partial(jax.jit, static_argnames=("chunk", "stride", "window"))
def estimate_normals_radius(
    pts: jnp.ndarray,
    mask: jnp.ndarray,
    radius: float | jnp.ndarray = 1.0,
    chunk: int = 4096,
    stride: int = 1,
    window: int = 0,
) -> jnp.ndarray:
    """Radius-neighborhood PCA normals as pure MXU moment accumulation.

    TPU-first alternative to the k-NN formulation: instead of ranking
    neighbors (top-k = sort = slow on TPU), accumulate the 0th/1st/2nd
    moments of all points within ``radius`` directly:

        cnt_i = sum_j m_ij,  S1_i = sum_j m_ij t_j,  S2_i = sum_j m_ij vec(t_j t_j^T)

    where m_ij = [d_ij^2 < r^2]. Each target chunk contributes ONE matmul
    M @ [1 | t | outer(t)] — no sort, no top-k, no gather. The covariance is
    S2/cnt - mean mean^T, then the analytic smallest eigenvector.

    Semantics deviation from the reference's k=20 PCA (icp.hpp:23-67): the
    neighborhood is a fixed metric ball instead of 20 ranked neighbors. On
    voxel-downsampled clouds with radius ~2-3 voxels the estimated planes are
    equivalent; tests check agreement on analytic surfaces. Rows with < 3
    neighbors (or invalid) get (0, 0, 1), matching the reference fallback.

    ``stride > 1``: compute normals for every stride-th point and replicate
    to the skipped rows — clouds are voxel-key sorted, so adjacent rows are
    spatial neighbors and the normal field is smooth at voxel scale. Halves
    (stride=2) the dominant moment-accumulation cost.

    ``window > 0``: x-slab windowed accumulation — REQUIRES an x-major-sorted
    cloud (the voxel downsampler's output order, ops/voxel.py; the native
    host voxelizer sorts identically). Each tile of 256 consecutive source
    points accumulates moments over ONE contiguous ``window``-point range of
    the sorted cloud found by binary search with an x-margin of ``radius``
    (the slab trick from ops/slab_nn.py). Unlike pruned nearest-neighbor
    search this is EXACT whenever the window covers the tile's x-band: any
    point outside it has |dx| > radius and would have mask 0 anyway. Cost
    drops from O(N^2) to O(N * window) — 8x at 32k points / window 4096.

    COVERAGE CAVEAT: the window must fit every +-radius x-band — i.e.
    window >= (2 * radius + tile x-span) * max points-per-meter-of-x. Holds
    comfortably for voxel-downsampled clouds with the default
    radius = 2.4 * voxel (the voxel grid bounds density); for dense
    PASS-THROUGH clouds shrink the radius to match the true point spacing or
    the truncated neighborhoods silently bias the normals (measured: 1.15 m
    odometry error at 131k-point clouds with radius 1.2 / window 2048).
    """
    N = pts.shape[0]
    radius = jnp.asarray(radius, pts.dtype)
    # Per-point radii: (N,) array (see estimate_normals_adaptive). A scalar
    # broadcasts to every row of the mask compare below.
    r_col = radius[:, None] if radius.ndim == 1 else radius
    pts_m_full = jnp.where(mask[:, None], pts, 1.0e6)  # sentinel, never in radius
    if stride > 1:
        sub = estimate_normals_radius(
            pts[::stride], mask[::stride],
            radius[::stride] if radius.ndim == 1 else radius, chunk, stride=1,
            window=window,
        )
        n = jnp.repeat(sub, stride, axis=0)[:N]
        # replicated rows keep their own validity fallback
        up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], pts.dtype), n.shape)
        return jnp.where(mask[:, None], n, up)
    if window > 0 and window < N:
        return _normals_radius_slab(pts_m_full, mask, radius, window)
    c = min(chunk, N)
    while N % c:
        c -= 1
    pts_m = pts_m_full

    # per-target feature rows: [1, x, y, z, xx, yy, zz, xy, xz, yz]
    def feats(t):
        x, y, z = t[:, 0], t[:, 1], t[:, 2]
        return jnp.stack(
            [jnp.ones_like(x), x, y, z, x * x, y * y, z * z, x * y, x * z, y * z],
            axis=1,
        )

    def body(acc, tgt_c):
        # Broadcast-difference distances: exact f32 on the VPU. The matmul
        # expansion would need 6-pass HIGHEST precision at terrible K=8 MXU
        # utilization — measured ~4x slower.
        d2 = (
            (pts_m[:, 0:1] - tgt_c[None, :, 0].reshape(1, -1)) ** 2
            + (pts_m[:, 1:2] - tgt_c[None, :, 1].reshape(1, -1)) ** 2
            + (pts_m[:, 2:3] - tgt_c[None, :, 2].reshape(1, -1)) ** 2
        )
        m = (d2 < r_col * r_col).astype(jnp.bfloat16)  # 0/1: exact in bf16
        # three-way bf16 split of the features: three native-speed bf16
        # matmuls reconstruct f32 accuracy. Second moments at 80 m range are
        # ~6400 m^2 while the covariance signal is ~0.1 m^2; a two-way split
        # still leaves ~0.06 m^2 of rounding per element — the third term
        # brings it to ~2e-4.
        # Three-way bf16 split via lax.reduce_precision: the naive
        # `f - f.astype(bf16).astype(f32)` residual is FOLDED AWAY by XLA's
        # allow_excess_precision pass on TPU (down/upcast pairs become
        # identity), silently destroying the split. reduce_precision is a
        # semantic op the compiler must honor.
        f = feats(tgt_c)
        f_hi32 = jax.lax.reduce_precision(f, exponent_bits=8, mantissa_bits=7)
        r1 = f - f_hi32
        f_mid32 = jax.lax.reduce_precision(r1, exponent_bits=8, mantissa_bits=7)
        r2 = r1 - f_mid32
        part = (
            jnp.matmul(m, f_hi32.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
            + jnp.matmul(m, f_mid32.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
            + jnp.matmul(m, r2.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        )
        return acc + part, None

    chunks = pts_m.reshape(N // c, c, 3)
    acc0 = jnp.zeros((N, 10), pts.dtype)
    acc, _ = jax.lax.scan(body, acc0, chunks)

    cnt = acc[:, 0]
    cnt_safe = jnp.maximum(cnt, 1.0)
    mean = acc[:, 1:4] / cnt_safe[:, None]
    xx, yy, zz, xy, xz, yz = (acc[:, 4 + i] / cnt_safe for i in range(6))
    mx, my, mz = mean[:, 0], mean[:, 1], mean[:, 2]
    cov = jnp.stack(
        [
            jnp.stack([xx - mx * mx, xy - mx * my, xz - mx * mz], axis=-1),
            jnp.stack([xy - mx * my, yy - my * my, yz - my * mz], axis=-1),
            jnp.stack([xz - mx * mz, yz - my * mz, zz - mz * mz], axis=-1),
        ],
        axis=-2,
    )
    n = smallest_eigvec_3x3(cov)
    n = jnp.where(n[..., 2:3] < 0, -n, n)
    degenerate = (cnt < 3.0) | ~mask
    up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], pts.dtype), n.shape)
    return jnp.where(degenerate[..., None], up, n)


def _radius_counts(
    pts_m: jnp.ndarray, radius: float, window: int, chunk: int = 4096,
    ts: int = 256,
) -> jnp.ndarray:
    """Neighbor counts within a scalar ``radius`` — see :func:`_radius_counts2`."""
    return _radius_counts2(pts_m, (radius,), window, chunk, ts)[0]


def _radius_counts2(
    pts_m: jnp.ndarray, radii: tuple, window: int, chunk: int = 4096,
    ts: int = 256, tgt: jnp.ndarray | None = None,
) -> tuple:
    """Neighbor counts within each scalar radius in ``radii``, ONE d2 sweep.

    compare + reduce only — no moment matmuls; ~40% of a full moment pass
    for the sweep, and the extra radii add just a compare+sum each (the
    pairwise d2 dominates) — fusing the adaptive estimator's two count
    probes here saves a full sweep vs calling once per radius.
    ``window > 0`` uses the x-slab scan over the x-major-sorted cloud, else
    full chunked streaming.

    ``tgt``: optional (M, 3) subset of query rows (counts are still taken
    over ALL of ``pts_m``) — the adaptive estimator probes a strided target
    subset and replicates the smooth radius field (see
    estimate_normals_adaptive(probe_stride=...))."""
    from .grid_nn import _searchsorted_left

    N = pts_m.shape[0]
    if tgt is None:
        tgt = pts_m
    M = tgt.shape[0]
    r2s = [jnp.asarray(r * r, pts_m.dtype) for r in radii]
    r_max_s = max(float(r) for r in radii)
    if 0 < window < N:
        ts = min(ts, M)
        # pad the target to a multiple of the tile size (repeating the last
        # row: its counts are recomputed then discarded, and it cannot widen
        # the final tile's x-span) — shrinking ts to a divisor of a strided
        # M = ceil(N/ps) could collapse to ts=1 (prime M) and turn the probe
        # into an M-iteration scan
        pad = -M % ts
        if pad:
            tgt = jnp.concatenate(
                [tgt, jnp.broadcast_to(tgt[-1:], (pad, 3))], axis=0
            )
        Mp = M + pad
        x_mono = jax.lax.cummax(pts_m[:, 0])
        tiles = tgt.reshape(Mp // ts, ts, 3)
        tile_min_x = jnp.min(tiles[:, :, 0], axis=1) - r_max_s
        starts = _searchsorted_left(x_mono, tile_min_x).astype(jnp.int32)
        starts = jnp.clip(starts, 0, max(N - window, 0))

        def per_tile(carry, inputs):
            tile, start = inputs
            win = jax.lax.dynamic_slice_in_dim(pts_m, start, window)
            d2 = (
                (tile[:, 0:1] - win[None, :, 0].reshape(1, -1)) ** 2
                + (tile[:, 1:2] - win[None, :, 1].reshape(1, -1)) ** 2
                + (tile[:, 2:3] - win[None, :, 2].reshape(1, -1)) ** 2
            )
            return carry, tuple(
                jnp.sum((d2 < r2).astype(pts_m.dtype), axis=1) for r2 in r2s
            )

        _, cnts = jax.lax.scan(per_tile, None, (tiles, starts))
        return tuple(c.reshape(Mp)[:M] for c in cnts)

    c = min(chunk, N)
    while N % c:
        c -= 1

    def body(accs, src_c):
        d2 = (
            (tgt[:, 0:1] - src_c[None, :, 0].reshape(1, -1)) ** 2
            + (tgt[:, 1:2] - src_c[None, :, 1].reshape(1, -1)) ** 2
            + (tgt[:, 2:3] - src_c[None, :, 2].reshape(1, -1)) ** 2
        )
        return tuple(
            acc + jnp.sum((d2 < r2).astype(pts_m.dtype), axis=1)
            for acc, r2 in zip(accs, r2s)
        ), None

    acc0 = tuple(jnp.zeros((M,), pts_m.dtype) for _ in r2s)
    accs, _ = jax.lax.scan(body, acc0, pts_m.reshape(N // c, c, 3))
    return accs


@functools.partial(
    jax.jit,
    static_argnames=("k", "chunk", "window", "r_probe", "r_min", "r_max",
                     "stride", "probe_stride"),
)
def estimate_normals_adaptive(
    pts: jnp.ndarray,
    mask: jnp.ndarray,
    k: int = 20,
    r_probe: tuple = (2.0, 8.0),
    r_min: float = 1.2,
    r_max: float = 20.0,
    window: int = 0,
    chunk: int = 4096,
    stride: int = 1,
    probe_stride: int = 1,
) -> jnp.ndarray:
    """Count-targeted per-point-radius moment normals (k-NN-ball emulation).

    A fixed metric ball fails on anisotropic ring-pattern LiDAR: beyond
    ~25 m the ball holds a near-collinear single-ring arc and the PCA normal
    is garbage, while the reference's k=20 ranked neighborhood (icp.hpp:26)
    reaches however far it must (measured on the 64-beam simulator: 176 mm
    per-frame odometry error vs the f64 mirror with fixed radius, 0.1 mm with
    k-NN normals). Exact k-NN is rank-based (sorts — 40-140x slower than
    moment accumulation at 32k on v5e). Instead, pick PER-POINT radii that
    target ``k`` neighbors, then run one per-point-radius moment pass:

    1. two cheap COUNT passes at ``r_probe`` scales (compare + row-sum),
    2. local intrinsic dimension  dim_i = log(c_hi/c_lo) / log(r_hi/r_lo)
       (1 on a ring arc, 2 on a surface), clipped to [0.7, 2.5],
    3. r_i = r_hi * (k / c_hi)^(1/dim_i), clipped to [r_min, r_max],
    4. moment-accumulation PCA with radius vector r_i (same kernels,
       per-row mask compare).

    Normals agree with true k-NN PCA to p90 < 1 degree on ring scans and the
    per-frame ICP delta error vs the f64 mirror drops 176 -> 11 mm.

    ``probe_stride > 1``: run the COUNT probes (step 1) on every
    probe_stride-th target point only and replicate the resulting radius to
    the skipped rows. Unlike ``stride`` (which replicates the NORMALS — a
    measured net loss from noise), this replicates only the smooth per-point
    RADIUS field over voxel-sorted adjacent rows; the moment PCA itself
    (step 4) still runs exactly per point. Cuts the probe d2 sweep by
    ~probe_stride x, ~40% of the total adaptive cost.

    REQUIRES the engine's VOXEL-KEY sort order (ops/voxel.py; adjacent rows
    are neighboring voxel columns, so the replicated radius is spatially
    local). Under a raw x-only sort adjacent rows can sit on opposite ring
    sides and replication degrades (measured: p90 normal delta 4.4 deg at
    probe_stride=4 vs 1.0 deg at probe_stride=2 under voxel order — see
    tests/test_normals.py::test_adaptive_probe_stride_matches_exact).
    """
    if stride > 1:
        # normals for every stride-th (x-sorted) point, replicated to the
        # skipped rows — adjacent sorted rows are voxel-scale neighbors and
        # the ADAPTIVE radius field is smooth, so replication stays on the
        # same local plane. The count probes run on the STRIDED cloud (a
        # uniform 1/stride thinning), so the neighbor-count target is scaled
        # to k/stride: the radius holding k/stride thinned neighbors is the
        # radius holding ~k full-cloud neighbors — the reference-equivalent
        # neighborhood size (dim estimation is count-RATIO based and
        # unaffected by uniform thinning).
        N = pts.shape[0]
        sub = estimate_normals_adaptive(
            pts[::stride], mask[::stride], k=max(k // stride, 4),
            r_probe=r_probe,
            r_min=r_min, r_max=r_max, window=window, chunk=chunk, stride=1,
            probe_stride=probe_stride,
        )
        n = jnp.repeat(sub, stride, axis=0)[:N]
        up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], pts.dtype), n.shape)
        return jnp.where(mask[:, None], n, up)
    N = pts.shape[0]
    pts_m = jnp.where(mask[:, None], pts, 1.0e6)
    r_lo, r_hi = float(r_probe[0]), float(r_probe[1])
    # both probe radii in ONE pairwise-d2 sweep (the d2 dominates; a second
    # radius adds only a compare+sum) — saves a full count pass vs two calls
    ps = max(int(probe_stride), 1)
    # the probe tile size shrinks as 256/ps (floored at 8) to keep each
    # tile's x-band inside the slab window; past ps=32 the floor breaks
    # that coverage guarantee (a tile would span 8*ps > 256 sorted rows)
    if ps > 32:
        raise ValueError(f"probe_stride must be <= 32, got {ps}")
    tgt = pts_m[::ps] if ps > 1 else None
    # strided probe tiles span ps x the x-range of full tiles; shrink the
    # tile size by ps so each tile's +-r_hi x-band stays inside ``window``
    # (the slab coverage condition) — the saving is the ps-x narrower d2
    # tile, not fewer tiles.
    c_lo, c_hi = _radius_counts2(
        pts_m, (r_lo, r_hi), window, chunk, ts=max(256 // ps, 8), tgt=tgt
    )
    c_lo = jnp.maximum(c_lo, 2.0)
    c_hi = jnp.maximum(c_hi, 2.0)
    dim = jnp.clip(
        jnp.log(c_hi / c_lo) / jnp.log(r_hi / r_lo), 0.7, 2.5
    )
    r_i = jnp.clip(
        r_hi * (float(k) / c_hi) ** (1.0 / dim), r_min, r_max
    ).astype(pts.dtype)
    if ps > 1:
        r_i = jnp.repeat(r_i, ps, axis=0)[:N]
    return estimate_normals_radius(
        pts, mask, radius=r_i, chunk=chunk, window=window
    )


def _feats10(t: jnp.ndarray) -> jnp.ndarray:
    """Per-point moment features [1, x, y, z, xx, yy, zz, xy, xz, yz]."""
    x, y, z = t[:, 0], t[:, 1], t[:, 2]
    return jnp.stack(
        [jnp.ones_like(x), x, y, z, x * x, y * y, z * z, x * y, x * z, y * z],
        axis=1,
    )


def _bf16_split3_matmul(m: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """m @ f as three native bf16 MXU passes reconstructing f32 accuracy.

    ``lax.reduce_precision`` (not astype round-trips, which XLA's
    allow_excess_precision pass folds away) — see estimate_normals_radius."""
    f_hi32 = jax.lax.reduce_precision(f, exponent_bits=8, mantissa_bits=7)
    r1 = f - f_hi32
    f_mid32 = jax.lax.reduce_precision(r1, exponent_bits=8, mantissa_bits=7)
    r2 = r1 - f_mid32
    return (
        jnp.matmul(m, f_hi32.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
        + jnp.matmul(m, f_mid32.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        + jnp.matmul(m, r2.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    )


def _normals_radius_slab(
    pts_m: jnp.ndarray, mask: jnp.ndarray, radius, window: int,
    ts: int = 256,
) -> jnp.ndarray:
    """x-slab windowed radius-moment normals over an x-major-sorted cloud.

    See estimate_normals_radius(window=...) for the exactness argument."""
    from .grid_nn import _searchsorted_left

    N = pts_m.shape[0]
    ts = min(ts, N)
    while N % ts:
        ts -= 1
    window = min(window, N)

    radius = jnp.asarray(radius, pts_m.dtype)
    per_point = radius.ndim == 1
    r_tiles = (
        radius.reshape(N // ts, ts)
        if per_point
        else jnp.broadcast_to(radius, (N // ts, ts))
    )

    # Sorted order is x-monotone at voxel granularity only; binary-search the
    # running max of x (monotone, >= x) so the window start is safe.
    x_mono = jax.lax.cummax(pts_m[:, 0])
    tiles = pts_m.reshape(N // ts, ts, 3)
    tile_min_x = jnp.min(tiles[:, :, 0], axis=1) - jnp.max(r_tiles, axis=1)
    starts = _searchsorted_left(x_mono, tile_min_x).astype(jnp.int32)
    starts = jnp.clip(starts, 0, max(N - window, 0))

    def per_tile(carry, inputs):
        tile, start, r_tile = inputs
        win = jax.lax.dynamic_slice_in_dim(pts_m, start, window)  # (W, 3)
        d2 = (
            (tile[:, 0:1] - win[None, :, 0].reshape(1, -1)) ** 2
            + (tile[:, 1:2] - win[None, :, 1].reshape(1, -1)) ** 2
            + (tile[:, 2:3] - win[None, :, 2].reshape(1, -1)) ** 2
        )
        m = (d2 < (r_tile * r_tile)[:, None]).astype(jnp.bfloat16)
        return carry, _bf16_split3_matmul(m, _feats10(win))  # (ts, 10)

    _, acc = jax.lax.scan(per_tile, None, (tiles, starts, r_tiles))
    acc = acc.reshape(N, 10)

    cnt = acc[:, 0]
    cnt_safe = jnp.maximum(cnt, 1.0)
    mean = acc[:, 1:4] / cnt_safe[:, None]
    xx, yy, zz, xy, xz, yz = (acc[:, 4 + i] / cnt_safe for i in range(6))
    mx, my, mz = mean[:, 0], mean[:, 1], mean[:, 2]
    cov = jnp.stack(
        [
            jnp.stack([xx - mx * mx, xy - mx * my, xz - mx * mz], axis=-1),
            jnp.stack([xy - mx * my, yy - my * my, yz - my * mz], axis=-1),
            jnp.stack([xz - mx * mz, yz - my * mz, zz - mz * mz], axis=-1),
        ],
        axis=-2,
    )
    n = smallest_eigvec_3x3(cov)
    n = jnp.where(n[..., 2:3] < 0, -n, n)
    degenerate = (cnt < 3.0) | ~mask
    up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], pts_m.dtype), n.shape)
    return jnp.where(degenerate[..., None], up, n)
