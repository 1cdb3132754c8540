"""BASELINE config ladder #5: dense 128k-point clouds with the ICP
correspondence search sharded across a mesh.

On real multi-chip hardware this runs over ICI; here it demonstrates the
programming model on N virtual CPU devices (or however many devices exist).
The target axis of the O(S*T) search is sharded over 'pts'; each device
computes a local (min, argmin) against its shard and an all_gather+argmin
combine picks global neighbors — the blockwise-streaming accumulator of the
single-chip kernels (SURVEY.md §2) lifted across chips.

Run:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/sharded_dense_knn.py
"""

import os
import sys
import time

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# force the CPU backend BEFORE the first device query (the axon TPU plugin
# ignores the JAX_PLATFORMS env var, and after backend init it is too late)
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lidar_slam_tpu.ops.knn import nn1
from lidar_slam_tpu.parallel import make_mesh, nn1_target_sharded


def main():
    n_dev = len(jax.devices())
    mesh = make_mesh({"pts": n_dev})
    print(f"devices: {n_dev}, mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    # dense 128-beam scan is 131072 points; scale with available devices so
    # the demo stays fast on a virtual CPU mesh
    N = min(131072, 8192 * n_dev)
    rng = np.random.default_rng(0)
    src = jnp.asarray((rng.normal(size=(N, 3)) * 40).astype(np.float32))
    tgt = jnp.asarray((rng.normal(size=(N, 3)) * 40).astype(np.float32))
    mask = jnp.ones((N,), bool)

    sharded = jax.jit(
        lambda s, t, m: nn1_target_sharded(s, t, m, mesh, axis="pts")
    )
    idx, d2 = sharded(src, tgt, mask)
    jax.block_until_ready((idx, d2))
    t0 = time.perf_counter()
    idx, d2 = sharded(src, tgt, mask)
    _ = np.asarray(idx[:1])
    dt = time.perf_counter() - t0
    print(f"sharded 1-NN {N}x{N}: {dt*1e3:.1f} ms across {n_dev} devices")

    # correctness vs single-device on a subset
    idx_ref, d2_ref = nn1(src[:4096], tgt, mask)
    match = float(jnp.mean((idx[:4096] == idx_ref).astype(jnp.float32)))
    print(f"agreement with single-device search: {match:.4f}")
    assert match > 0.999


if __name__ == "__main__":
    main()
