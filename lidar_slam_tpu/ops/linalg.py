"""Small fixed-size linear algebra, unrolled for the TPU VPU.

XLA lowers ``jnp.linalg.solve`` to a general LU factorization that costs
~100 ms for a single 6x6 on TPU — catastrophic for the per-ICP-iteration
Gauss-Newton solve (the reference uses Eigen LDLT on CPU, icp.hpp:120).
These helpers unroll Cholesky-Crout + triangular substitution into straight-
line scalar jnp ops: a few hundred FLOPs, fully fusable, batched over leading
dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

_JITTER = 1e-12


def cholesky_small(A: jnp.ndarray) -> list:
    """Lower-triangular Cholesky factor of (…, n, n) PSD A as a list-of-lists
    of (…,) scalars (n is static and small)."""
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for p in range(j):
                s = s - L[i][p] * L[j][p]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, _JITTER))
            else:
                L[i][j] = s / L[j][j]
    return L


def solve_psd_small(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for PSD (…, n, n) A and (…, n) b via unrolled Cholesky."""
    n = A.shape[-1]
    L = cholesky_small(A)
    # forward: L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for p in range(i):
            s = s - L[i][p] * y[p]
        y[i] = s / L[i][i]
    # backward: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for p in range(i + 1, n):
            s = s - L[p][i] * x[p]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)
