#!/usr/bin/env python
"""1-NN backend shootout at bench shapes (8192 queries x 32768 targets).

The ICP inner loop does ~4 NN passes per scan; at 32k targets the exact
Pallas VPU kernel is the dominant step cost. This measures the pruned
backends (grid: sorted-cell 3x3 probes; slab: x-window) against it for
both speed and exactness on real voxelized ring scans.

Usage: python tools/profile_nn.py
"""

from __future__ import annotations

import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from lidar_slam_tpu.ops.grid_nn import build_grid, nn1_grid
    from lidar_slam_tpu.ops.knn import nn1
    from lidar_slam_tpu.ops.knn_pallas import nn1_pallas
    from lidar_slam_tpu.ops.slab_nn import nn1_slab
    from lidar_slam_tpu.ops.voxel import voxel_downsample

    print(f"backend: {jax.default_backend()}")
    N, S = 32768, 8192
    z = np.load("/tmp/validate_rings_cache/scans_f1000_b64_a1024.npz")

    def prep(s):
        buf = np.zeros((65536, 3), np.float32)
        buf[: len(s)] = s
        return voxel_downsample(
            jnp.asarray(buf), jnp.arange(65536) < len(s), 0.5, N
        )

    clouds = [prep(z[f"s{i}"]) for i in range(8)]
    # queries: strided subsample of the NEXT scan (the ICP source pattern)
    queries = []
    for i in range(8):
        pts, mask = clouds[(i + 1) % 8]
        cnt = int(mask.sum())
        sel = (np.arange(S) * cnt) // S
        queries.append(pts[sel])

    tgt0, m0 = clouds[0]
    q0 = queries[0]
    ref_idx, ref_d2 = nn1(q0, tgt0, m0)
    ref_idx = np.asarray(ref_idx)
    ref_d2 = np.asarray(ref_d2)

    def bench(label, fn, check=True):
        out = fn(0)
        jax.block_until_ready(out)
        if check:
            idx, d2 = out
            idx, d2 = np.asarray(idx), np.asarray(d2)
            miss = (idx != ref_idx).mean()
            # distance regret of misses (a miss to an equally-near point is
            # harmless for ICP)
            regret = np.sqrt(np.maximum(d2, 0)) - np.sqrt(np.maximum(ref_d2, 0))
            p99 = np.percentile(regret, 99.9)
            extra = f" miss={miss * 100:.2f}% regret p99.9={p99 * 100:.1f} cm"
        else:
            extra = ""
        t0 = time.perf_counter()
        for r in range(32):
            out = fn(r % 8)
        jax.block_until_ready(out)
        np.asarray(out[0][:1])
        dt = (time.perf_counter() - t0) / 32 * 1e3
        print(f"  {label}: {dt:6.3f} ms{extra}")

    bench("pallas exact   ", lambda r: nn1_pallas(queries[r], *clouds[r % 8]))
    bench("xla streamed   ", lambda r: nn1(queries[r], *clouds[r % 8]))
    bench("slab w=2048    ", lambda r: nn1_slab(queries[r], *clouds[r % 8]))
    for cell, w in [(1.0, 32), (1.0, 64), (2.0, 32), (2.0, 64)]:
        def run(r, cell=cell, w=w):
            pts, mask = clouds[r % 8]
            g = build_grid(pts, mask, cell)
            return nn1_grid(queries[r], g, window=w)

        bench(f"grid c={cell} w={w:3d}", run)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
