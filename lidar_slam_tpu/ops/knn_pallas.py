"""Pallas TPU kernel: blockwise-streamed 1-nearest-neighbor search.

This is the per-ICP-iteration hot kernel (the reference spends its time in
KD-tree queries, kdtree.hpp:112-142, called twice per iteration from
icp.hpp:185,190). The XLA fallback (ops/knn.py) streams target chunks through
HBM; this kernel keeps everything in VMEM:

- grid = (source tiles, target tiles); the target-tile axis is innermost and
  sequential on TPU, so each source tile holds a running (min, argmin)
  accumulator in its output block across target tiles — the flash-attention
  pattern applied to metric search (SURVEY.md §2's "ring-attention-shaped"
  blockwise streaming).
- the cross term s.t rides the MXU from (TS, 8) x (8, TT) tiles (coordinates
  zero-padded from 3 to 8 lanes); distance ranking uses t^2 - 2 s.t (the s^2
  row constant cannot change the argmin and is added back at the end).
- f32-accurate matmul (HIGHEST) — bf16 MXU passes lose ~0.3 m at 80 m range.

Masked-out target points are displaced to a far sentinel before tiling, so
they never win the argmin. Shapes are padded to tile multiples; padded source
rows produce garbage results that downstream masking discards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .knn import SENTINEL, mask_points

_PREC = jax.lax.Precision.HIGHEST


def pallas_supported() -> bool:
    return jax.default_backend() == "tpu"


def _nn1_kernel(src_ref, tgt_t_ref, minv_ref, argm_ref):
    # Broadcast-difference distances on the VPU: for K=3 coordinates a matmul
    # (even on the MXU) runs at ~8/128 systolic utilization; three fused
    # (TS,1)-(1,TT) subtract-square-accumulate sweeps are faster AND exact f32
    # (no |s|^2+|t|^2-2s.t cancellation).
    j = pl.program_id(1)
    tt = tgt_t_ref.shape[1]
    dx = src_ref[:, 0:1] - tgt_t_ref[0:1, :]
    dy = src_ref[:, 1:2] - tgt_t_ref[1:2, :]
    dz = src_ref[:, 2:3] - tgt_t_ref[2:3, :]
    d = dx * dx + dy * dy + dz * dz                         # (TS, TT)
    local_min = jnp.min(d, axis=1, keepdims=True)           # (TS, 1)
    local_arg = jnp.argmin(d, axis=1).astype(jnp.int32)[:, None] + j * tt

    @pl.when(j == 0)
    def _():
        minv_ref[:] = local_min
        argm_ref[:] = local_arg

    @pl.when(j > 0)
    def _():
        better = local_min < minv_ref[:]
        minv_ref[:] = jnp.where(better, local_min, minv_ref[:])
        argm_ref[:] = jnp.where(better, local_arg, argm_ref[:])


def _pad_rows(x: jnp.ndarray, multiple: int, value: float) -> jnp.ndarray:
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x
    return jnp.pad(x, ((0, rem),) + ((0, 0),) * (x.ndim - 1), constant_values=value)


@functools.partial(
    jax.jit, static_argnames=("ts", "tt", "interpret")
)
def nn1_pallas(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    ts: int = 256,
    tt: int = 2048,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """1-NN indices + squared distances of ``src`` (S, 3) in ``tgt`` (T, 3).

    Same contract as ops.knn.nn1. ``interpret=True`` runs the kernel in the
    Pallas interpreter (for CPU tests).
    """
    S = src.shape[0]
    T = tgt.shape[0]
    tgt = mask_points(tgt, tgt_mask)

    ts = min(ts, max(8, S))
    tt = min(tt, max(128, T))

    src_p = _pad_rows(src, ts, SENTINEL)
    tgt_p = _pad_rows(tgt, tt, SENTINEL)
    Sp, Tp = src_p.shape[0], tgt_p.shape[0]

    # (Sp, 8) zero-padded coords (sublane-aligned); (8, Tp) transposed target
    src8 = jnp.concatenate(
        [src_p, jnp.zeros((Sp, 5), src_p.dtype)], axis=1
    )
    tgt8 = jnp.concatenate(
        [tgt_p, jnp.zeros((Tp, 5), tgt_p.dtype)], axis=1
    ).T

    grid = (Sp // ts, Tp // tt)

    # sequential_vmap: lanes of a batched engine run the kernel via lax.map
    # (the revolving-accumulator kernel has no native batch axis)
    @jax.custom_batching.sequential_vmap
    def call(src8, tgt8):
        out = pl.pallas_call(
            _nn1_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((ts, 8), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, tt), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((ts, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ts, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Sp, 1), jnp.float32),
                jax.ShapeDtypeStruct((Sp, 1), jnp.int32),
            ],
            interpret=interpret,
        )(src8, tgt8)
        return tuple(out)

    minv, argm = call(src8, tgt8)
    return argm[:S, 0], jnp.maximum(minv[:S, 0], 0.0)


# ---------------------------------------------------------------------------
# Slab-windowed search: the Pallas version of ops/slab_nn.py.
#
# Voxel-downsampled clouds are x-major sorted (ops/voxel.py output order; the
# native host voxelizer sorts identically), so every target within ``margin``
# of a tile of TS consecutive source points lies in ONE CONTIGUOUS RANGE of
# the target array — the TPU answer to the KD-tree's O(log n) pruning
# (kdtree.hpp:112-142). The pure-XLA slab backend proved the windowing sound
# but lost its gains to lax.scan serialization + per-step dynamic-slice DMA;
# here the WHOLE target rides in VMEM (32k x 8 lanes f32 = 1 MB) and each
# grid step slices its window from VMEM for free:
#
#     cost = S * W  distance work   instead of   S * T   (W = T/8 at 32k)
#
# The fused variant additionally returns the MATCHED target point and normal
# per source row (the ICP iteration's gather, icp.hpp:185-196): the argmin
# one-hot matrix times the in-VMEM window rides the MXU, so the per-iteration
# HBM round-trip (idx out -> XLA gather from a 32k cloud) disappears. The
# one-hot selection must be f32-exact (coordinates at 200 m in bf16 would
# round by ~1 m) — a 3-way bf16 split via lax.reduce_precision reconstructs
# f32 exactly (same trick as ops/normals._bf16_split3_matmul).
# ---------------------------------------------------------------------------

_QUANT = 128   # window starts rounded down to lane-aligned multiples
_LUT_BINS = 4096  # quantized x -> target-index lookup resolution


class _SlabIndex:
    """Per-target acceleration state, built ONCE per ICP call.

    The per-NN-pass window-start computation must be cheap — a cummax +
    binary search per pass costs ~0.3 ms on v5e, half the whole kernel. So
    the search structure is precomputed: a B-bin lookup table mapping
    quantized x to the first target index at-or-after that x (one
    searchsorted over the running-max x at build time); each pass then pays
    one 16-element gather. LUT starts land at-or-before the exact
    searchsorted answer (bin edges floor the query), erring on the safe
    (earlier) side by at most one bin (~4 cm at KITTI extents)."""

    __slots__ = ("tgt8", "lut", "lo", "inv_h", "padded_T")

    def __init__(self, tgt8, lut, lo, inv_h, padded_T):
        self.tgt8 = tgt8
        self.lut = lut
        self.lo = lo
        self.inv_h = inv_h
        self.padded_T = padded_T


def _build_slab_index(
    tgt: jnp.ndarray, tgt_mask: jnp.ndarray,
    tgt_normals: jnp.ndarray | None,
) -> _SlabIndex:
    from .grid_nn import _searchsorted_left

    T = tgt.shape[0]
    tgt8 = _pack_tgt8(tgt, tgt_mask, tgt_normals, _QUANT)
    xs = tgt[:, 0]
    lo = jnp.min(jnp.where(tgt_mask, xs, jnp.inf))
    hi = jnp.max(jnp.where(tgt_mask, xs, -jnp.inf))
    h = jnp.maximum((hi - lo) / _LUT_BINS, 1e-6)
    # running max of the packed x (masked rows sit at the sentinel): monotone
    # and >= x everywhere, so searchsorted starts are safe (early-or-equal)
    x_mono = jax.lax.cummax(tgt8[0, :T])
    edges = lo + h * jnp.arange(_LUT_BINS, dtype=tgt.dtype)
    lut = _searchsorted_left(x_mono, edges).astype(jnp.int32)
    return _SlabIndex(tgt8, lut, lo, 1.0 / h, tgt8.shape[1])


def _slab_starts_lut(
    src_p: jnp.ndarray, index: _SlabIndex, ts: int, window: int, margin: float
) -> jnp.ndarray:
    """Per-source-tile window starts (int32, multiples of _QUANT), via the
    precomputed LUT. Clipped to the PADDED target width so start + window
    never overruns; both are _QUANT multiples, so the clip preserves lane
    alignment (pad columns sit at the sentinel and never win the argmin)."""
    tiles_x = src_p[:, 0].reshape(-1, ts)
    tile_min_x = jnp.min(tiles_x, axis=1) - margin
    b = jnp.clip(
        jnp.floor((tile_min_x - index.lo) * index.inv_h), 0, _LUT_BINS - 1
    ).astype(jnp.int32)
    starts = (index.lut[b] // _QUANT) * _QUANT
    return jnp.clip(starts, 0, max(index.padded_T - window, 0))


def _match_slab_kernel(starts_ref, src_ref, tgt_ref, qn_ref, minv_ref,
                       argm_ref, *, window):
    i = pl.program_id(0)
    start = pl.multiple_of(starts_ref[i], _QUANT)
    win = tgt_ref[:, pl.ds(start, window)]                  # (8, W)
    dx = src_ref[:, 0:1] - win[0:1, :]
    dy = src_ref[:, 1:2] - win[1:2, :]
    dz = src_ref[:, 2:3] - win[2:3, :]
    d = dx * dx + dy * dy + dz * dz                         # (TS, W)
    minv_ref[:] = jnp.min(d, axis=1, keepdims=True)
    am = jnp.argmin(d, axis=1).astype(jnp.int32)            # (TS,)
    argm_ref[:] = am[:, None] + start

    # Fused gather: one-hot(argmin) @ window^T on the MXU, f32-exact via the
    # 3-way bf16 split (the one-hot itself is exactly representable in bf16).
    # reduce_precision has no Pallas TPU lowering; truncate the mantissa by
    # bit-masking instead (round-to-zero — fine for a split, the residual
    # carries the rest and the three terms sum back to f32 exactly).
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    onehot = (cols == am[:, None]).astype(jnp.bfloat16)     # (TS, W)

    def trunc_bf16(x):
        bits = pltpu.bitcast(x, jnp.uint32) & jnp.uint32(0xFFFF0000)
        return pltpu.bitcast(bits, jnp.float32)

    w_hi = trunc_bf16(win)
    r1 = win - w_hi
    w_mid = trunc_bf16(r1)
    w_lo = r1 - w_mid
    dims = (((1,), (1,)), ((), ()))  # contract W against W
    qn = (
        jax.lax.dot_general(onehot, w_hi.astype(jnp.bfloat16), dims,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(onehot, w_mid.astype(jnp.bfloat16), dims,
                              preferred_element_type=jnp.float32)
        + jax.lax.dot_general(onehot, w_lo.astype(jnp.bfloat16), dims,
                              preferred_element_type=jnp.float32)
    )
    qn_ref[:] = qn                                          # (TS, 8)


def _match_slab_call(src, tgt8, starts, ts: int, window: int,
                     interpret: bool = False):
    Sp = src.shape[0]
    Tp = tgt8.shape[1]
    src8 = jnp.concatenate([src, jnp.zeros((Sp, 5), src.dtype)], axis=1)

    # sequential_vmap: under a batched (vmap) engine the per-lane scalar
    # `starts` operand would otherwise grow a batch dimension inside SMEM,
    # which the Pallas TPU lowering rejects — lanes run the kernel via
    # lax.map instead (the NN kernel is a small slice of the per-scan
    # budget, and batched lanes share one chip anyway).
    @jax.custom_batching.sequential_vmap
    def call(starts, src8, tgt8):
        out = pl.pallas_call(
            functools.partial(_match_slab_kernel, window=window),
            grid=(Sp // ts,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((ts, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, Tp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((ts, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ts, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ts, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Sp, 8), jnp.float32),
                jax.ShapeDtypeStruct((Sp, 1), jnp.float32),
                jax.ShapeDtypeStruct((Sp, 1), jnp.int32),
            ],
            interpret=interpret,
        )(starts, src8, tgt8)
        return tuple(out)

    qn, minv, argm = call(starts, src8, tgt8)
    return qn, minv, argm


def _pack_tgt8(
    tgt: jnp.ndarray, tgt_mask: jnp.ndarray,
    tgt_normals: jnp.ndarray | None, tt: int,
) -> jnp.ndarray:
    """(8, Tp) transposed target: lanes [x y z | nx ny nz | 0 0], masked rows
    at the sentinel, padded to a ``tt`` multiple."""
    tgt_m = mask_points(tgt, tgt_mask)
    T = tgt.shape[0]
    if tgt_normals is None:
        feats = jnp.concatenate([tgt_m, jnp.zeros((T, 5), tgt.dtype)], axis=1)
    else:
        feats = jnp.concatenate(
            [tgt_m, tgt_normals, jnp.zeros((T, 2), tgt.dtype)], axis=1
        )
    feats = _pad_rows(feats, tt, SENTINEL)
    return feats.T


@functools.partial(jax.jit, static_argnames=("ts", "window", "interpret"))
def nn1_slab_pallas(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    ts: int = 256,
    window: int = 4096,
    margin: float = 3.0,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Slab-windowed 1-NN; same contract as ops.slab_nn.nn1_slab.

    Exact whenever the true NN is within ``margin`` of the query in x AND the
    window covers the tile's x-band (see ops/slab_nn.py); misses degrade to a
    farther correspondence, which point-to-plane ICP tolerates.
    """
    S = src.shape[0]
    T = tgt.shape[0]
    ts = min(ts, max(8, S))
    index = _build_slab_index(tgt, tgt_mask, None)
    window = min(window, index.padded_T)
    src_p = _pad_rows(src, ts, SENTINEL)
    starts = _slab_starts_lut(src_p, index, ts, window, margin)
    _, minv, argm = _match_slab_call(
        src_p, index.tgt8, starts, ts, window, interpret
    )
    return (
        jnp.minimum(argm[:S, 0], T - 1),
        jnp.maximum(minv[:S, 0], 0.0),
    )


@functools.partial(jax.jit, static_argnames=("ts", "window", "interpret"))
def match_slab_pallas(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    tgt_normals: jnp.ndarray,
    ts: int = 256,
    window: int = 4096,
    margin: float = 3.0,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused slab 1-NN + correspondence gather for the ICP iteration.

    Returns ``(matched (S, 3), normals (S, 3), dist2 (S,))`` — the matched
    target points and their normals, selected inside the kernel (no HBM
    gather). Equivalent to ``idx, d2 = nn1(...); tgt[idx], normals[idx], d2``.
    """
    index = _build_slab_index(tgt, tgt_mask, tgt_normals)
    return _match_slab_query(src, index, ts, window, margin, interpret)


def _match_slab_query(
    src: jnp.ndarray, index: _SlabIndex,
    ts: int, window: int, margin: float, interpret: bool,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    S = src.shape[0]
    ts = min(ts, max(8, S))
    window = min(window, index.padded_T)
    src_p = _pad_rows(src, ts, SENTINEL)
    starts = _slab_starts_lut(src_p, index, ts, window, margin)
    qn, minv, _ = _match_slab_call(
        src_p, index.tgt8, starts, ts, window, interpret
    )
    return qn[:S, 0:3], qn[:S, 3:6], jnp.maximum(minv[:S, 0], 0.0)


def make_slab_pallas_backend(
    ts: int = 256, window: int = 4096, margin: float = 3.0,
    interpret: bool = False,
):
    """Injectable ICP backend bundling the slab kernels.

    ``__call__`` satisfies the plain ``nn1_fn`` contract; ``prepare_match``
    satisfies ops/icp.py's fused protocol (matched points + normals selected
    in-kernel, no HBM gather)."""

    class _Backend:
        def __call__(self, s, t, m):
            return nn1_slab_pallas(
                s, t, m, ts=ts, window=window, margin=margin,
                interpret=interpret,
            )

        def prepare_match(self, tgt_pts, tgt_mask, tgt_normals):
            # one-time per ICP call: pack + cummax + LUT (~0.4 ms); each NN
            # pass then pays only a 16-element LUT gather + the kernel
            index = _build_slab_index(tgt_pts, tgt_mask, tgt_normals)

            def q(cur):
                return _match_slab_query(
                    cur, index, ts, window, margin, interpret
                )

            return q

    return _Backend()
