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
    minv, argm = pl.pallas_call(
        _nn1_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ts, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ts, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Sp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Sp, 1), jnp.int32),
        ],
        interpret=interpret,
    )(src8, tgt8)

    return argm[:S, 0], jnp.maximum(minv[:S, 0], 0.0)
