"""Pallas TPU kernel: fused radius-neighborhood moment accumulation.

The XLA radius-normals path (ops/normals.estimate_normals_radius) must
materialize the (N, chunk) neighbor mask in HBM between the distance compute
and the moment matmul (~1 GB of traffic per scan at N=16k). This kernel fuses
the whole per-tile chain in VMEM:

    cross = src8 @ tgt8^T           (MXU)
    d2    = |s|^2 + |t|^2 - 2 cross (VPU)
    m     = d2 < r^2                (VPU)
    acc  += m @ [1 | t | vec(t t^T)] (MXU)

so only the (N, 16) moment accumulator ever leaves the chip. f32-accurate
(HIGHEST) matmuls throughout — second moments at 80 m range (~6400 m^2) would
lose ~25 m^2 to bf16 input rounding, swamping the ~0.1 m^2 covariance signal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .knn import SENTINEL
from .normals import smallest_eigvec_3x3

_PREC = jax.lax.Precision.HIGHEST


def _kernel(r2_ref, src8_ref, srcsq_ref, tgt8t_ref, tgtsq_ref, feats_ref, acc_ref):
    j = pl.program_id(1)
    cross = jnp.dot(
        src8_ref[:], tgt8t_ref[:], preferred_element_type=jnp.float32,
        precision=_PREC,
    )  # (TS, TT)
    d2 = srcsq_ref[:] + tgtsq_ref[:] - 2.0 * cross
    m = (d2 < r2_ref[0, 0]).astype(jnp.float32)
    part = jnp.dot(
        m, feats_ref[:], preferred_element_type=jnp.float32, precision=_PREC
    )  # (TS, 16)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part


def _pad_rows(x, multiple, value):
    rem = (-x.shape[0]) % multiple
    if rem == 0:
        return x
    return jnp.pad(x, ((0, rem),) + ((0, 0),) * (x.ndim - 1), constant_values=value)


@functools.partial(jax.jit, static_argnames=("ts", "tt", "interpret"))
def radius_moments_pallas(
    pts: jnp.ndarray,
    mask: jnp.ndarray,
    radius,
    ts: int = 256,
    tt: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, 10) accumulated moments [cnt, Σt, Σvec(t tᵀ)] over the metric ball."""
    N = pts.shape[0]
    ts = min(ts, max(8, N))
    tt = min(tt, max(128, N))
    pts_m = jnp.where(mask[:, None], pts, SENTINEL)
    src = _pad_rows(pts_m, ts, SENTINEL)
    tgt = _pad_rows(pts_m, tt, 2.0 * SENTINEL)  # padding != sentinel: no match
    Sp, Tp = src.shape[0], tgt.shape[0]

    src8 = jnp.concatenate([src, jnp.zeros((Sp, 5), src.dtype)], axis=1)
    tgt8t = jnp.concatenate([tgt, jnp.zeros((Tp, 5), tgt.dtype)], axis=1).T
    src_sq = jnp.sum(src * src, axis=1)[:, None]   # (Sp, 1)
    tgt_sq = jnp.sum(tgt * tgt, axis=1)[None, :]   # (1, Tp)

    x, y, z = tgt[:, 0], tgt[:, 1], tgt[:, 2]
    feats = jnp.stack(
        [jnp.ones_like(x), x, y, z, x * x, y * y, z * z, x * y, x * z, y * z],
        axis=1,
    )
    feats = jnp.concatenate([feats, jnp.zeros((Tp, 6), feats.dtype)], axis=1)

    r2 = jnp.asarray(radius, jnp.float32).reshape(1, 1) ** 2

    acc = pl.pallas_call(
        _kernel,
        grid=(Sp // ts, Tp // tt),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ts, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, 16), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ts, 16), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Sp, 16), jnp.float32),
        interpret=interpret,
    )(r2, src8, src_sq, tgt8t, tgt_sq, feats)
    return acc[:N, :10]


def estimate_normals_radius_pallas(
    pts: jnp.ndarray,
    mask: jnp.ndarray,
    radius,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ops.normals.estimate_normals_radius on TPU."""
    acc = radius_moments_pallas(pts, mask, radius, interpret=interpret)
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
