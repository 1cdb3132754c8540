"""Device-mesh helpers for multi-chip SPMD.

The reference is single-process/single-threaded (SURVEY.md §2); scaling here
is jax.sharding-native: a Mesh over TPU chips, sequences data-parallel over a
'seq' axis and the brute-force kNN target axis sharded over a 'pts' axis with
XLA collectives riding ICI.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(axis_sizes: dict[str, int] | None = None) -> Mesh:
    """Build a mesh over all available devices.

    Default factorization: n devices -> ('seq', 'pts') with 'pts' taking the
    largest power-of-two factor <= sqrt(n) — kNN sharding benefits from ICI
    locality, sequence parallelism is embarrassingly parallel.
    """
    devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        pts = 1
        while pts * 2 <= max(int(np.sqrt(n)), 1) and n % (pts * 2) == 0:
            pts *= 2
        axis_sizes = {"seq": n // pts, "pts": pts}
    names = tuple(axis_sizes.keys())
    shape = tuple(axis_sizes.values())
    assert int(np.prod(shape)) == n, (shape, n)
    return Mesh(np.asarray(devices).reshape(shape), names)
