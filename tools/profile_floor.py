#!/usr/bin/env python
"""Measure the per-dispatch floor vs donated-state size, and step ablations.

Round-2 finding driver: a no-op donated dispatch on the full-KITTI state
(F=4608, 32k clouds, ~4 GB) costs ~5.9 ms on the axon tunnel — the same as
the whole per-frame budget at the 600-frame bench regime. This script pins
down whether that floor scales with state bytes, buffer count, or is fixed,
and ablates the full-scale step into ICP / normals / SC+DB writes / occupancy.

Usage: PYTHONPATH=. python tools/profile_floor.py
"""

from __future__ import annotations

import functools
import time

import numpy as np


def timed(label, fn, state, reps=20, extra=None):
    import jax.numpy as jnp

    t0 = time.perf_counter()
    state, out = fn(state, jnp.int32(0))
    np.asarray(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for r in range(reps):
        state, out = fn(state, jnp.int32(r + 1))
    np.asarray(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"  {label}: {dt:6.2f} ms   (compile {compile_s:.1f}s)")
    return state, dt


def main() -> int:
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}")
    jd = functools.partial(jax.jit, donate_argnums=0)

    # --- dispatch floor vs state size -----------------------------------
    @jd
    def bump(st, i):
        return st._replace(count=st.count + 1), st.count + i

    from typing import NamedTuple

    class S(NamedTuple):
        count: jnp.ndarray
        bufs: tuple

    for label, shapes in [
        ("1 tiny buf            ", [(8,)]),
        ("1 x 256 MB            ", [(64, 1024, 1024)]),
        ("1 x 1 GB              ", [(256, 1024, 1024)]),
        ("2 x 1.8 GB (KITTI DB) ", [(4608, 32768, 3), (4608, 32768, 3)]),
        ("16 x 16 MB            ", [(4, 1024, 1024)] * 16),
        ("64 x 1 MB             ", [(256, 1024)] * 64),
    ]:
        st = S(
            count=jnp.int32(0),
            bufs=tuple(jnp.zeros(s, jnp.float32) for s in shapes),
        )
        np.asarray(st.count)
        st, _ = timed(f"floor {label}", bump, st)
        del st

    # --- step ablations at full scale ------------------------------------
    from lidar_slam_tpu.config import ICPConfig, LoopClosureConfig, SlamConfig
    from lidar_slam_tpu.models import loop_closure as lc
    from lidar_slam_tpu.models import pipeline as pipe
    from lidar_slam_tpu.ops.icp import icp_point_to_plane
    from lidar_slam_tpu.ops import se3
    from lidar_slam_tpu.ops.occupancy import update_occupancy
    from lidar_slam_tpu.types import PointCloud

    F, DS = 4608, 32768
    cfg = SlamConfig(
        max_raw_points=131072, max_points=DS, max_frames=F, host_voxelize=True,
        icp=ICPConfig(sample_points=8192, tolerance=1e-4, max_iterations=20),
        lc=LoopClosureConfig(verify_sample=4096, verify_tolerance=1e-4),
    )
    rng = np.random.default_rng(0)
    state = pipe.init_state(cfg)
    scans = [
        jnp.asarray(rng.normal(size=(DS, 3)).astype(np.float32) * 20.0)
        for _ in range(4)
    ]
    nrm_fn = pipe._normals_fn(cfg)
    nn1_fn = pipe._resolve_nn1(cfg)

    state = pipe.make_init_fn(cfg)(state, scans[0], jnp.int32(DS))
    np.asarray(state.n_poses)
    print("step ablations (F=4608, 32k clouds):")

    scan_stack = jnp.stack(scans)  # (4, DS, 3)

    @jd
    def only_icp(st, i):
        curr = PointCloud(scan_stack[i % 4], jnp.ones((DS,), bool))
        res = icp_point_to_plane(
            curr, st.prev, st.prev_normals, cfg.icp, nn1_fn=nn1_fn
        )
        return st._replace(loop_count=st.loop_count + 1), res.final_error

    @jd
    def only_normals(st, i):
        curr = PointCloud(scan_stack[i % 4], jnp.ones((DS,), bool))
        nrm = nrm_fn(curr.points, curr.mask)
        return st._replace(prev_normals=nrm), nrm[0]

    @jd
    def only_db(st, i):
        curr = PointCloud(scan_stack[i % 4], jnp.ones((DS,), bool))
        db = lc.add_frame(st.db, curr, i, cfg.sc, enabled=True,
                          normals=st.prev_normals)
        return st._replace(db=db), db.last_frame

    @jd
    def only_occ(st, i):
        curr = PointCloud(scan_stack[i % 4], jnp.ones((DS,), bool))
        world = se3.apply(st.poses[i], curr.points)
        grid, _ = update_occupancy(
            st.grid, world, curr.mask, se3.trans(st.poses[i])[:2], cfg.grid
        )
        return st._replace(grid=grid), grid[0, 0]

    @jd
    def db_store_only(st, i):
        curr = PointCloud(scan_stack[i % 4], jnp.ones((DS,), bool))
        db = lc.add_frame(st.db, curr, i, cfg.sc, enabled=False,
                          normals=st.prev_normals)
        return st._replace(db=db), db.last_frame

    @jd
    def cand_gather_dynslice(st, i):
        # 6 dynamic_index slices instead of one fancy gather
        idx = (jnp.arange(6, dtype=jnp.int32) * 97 + i) % 4608
        acc = jnp.float32(0)
        outs = []
        for k in range(6):
            c = jax.lax.dynamic_index_in_dim(st.db.clouds, idx[k], 0, False)
            n = jax.lax.dynamic_index_in_dim(st.db.normals, idx[k], 0, False)
            m = jax.lax.dynamic_index_in_dim(st.db.cloud_mask, idx[k], 0, False)
            outs.append(jnp.sum(c) + jnp.sum(n) + jnp.sum(m))
        return st._replace(loop_count=st.loop_count + 1), sum(outs)

    @jd
    def cand_gather_fancy(st, i):
        idx = (jnp.arange(6, dtype=jnp.int32) * 97 + i) % 4608
        cc = st.db.clouds[idx]
        cn = st.db.normals[idx]
        cm = st.db.cloud_mask[idx]
        out = jnp.sum(cc) + jnp.sum(cn) + jnp.sum(cm)
        return st._replace(loop_count=st.loop_count + 1), out

    scans_j = scans
    state, _ = timed("icp only    ", only_icp, state)
    state, _ = timed("normals only", only_normals, state)
    state, _ = timed("db writes   ", only_db, state)
    state, _ = timed("db store only", db_store_only, state)
    state, _ = timed("occupancy   ", only_occ, state)
    state, _ = timed("gather fancy ", cand_gather_fancy, state)
    state, _ = timed("gather dynsl ", cand_gather_dynslice, state)

    step_fn = pipe.make_step_fn(cfg)

    def full(st, i):
        st = step_fn(st, scans_j[(int(np.asarray(i)) % 4)], jnp.int32(DS), i + 1)
        return st, st.n_poses

    # avoid host conversion inside timing: pre-make variant list
    @jd
    def full_step(st, i):
        return step_fn(st, scans_j[0], jnp.int32(DS), i + 1), jnp.int32(0)

    # full step with rotating scans, chained
    t0 = time.perf_counter()
    state = step_fn(state, scans_j[0], jnp.int32(DS), jnp.int32(1))
    np.asarray(state.n_poses)
    print(f"  full step compile+first: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    reps = 20
    for r in range(reps):
        state = step_fn(state, scans_j[r % 4], jnp.int32(DS), jnp.int32(r + 2))
    np.asarray(state.n_poses)
    print(f"  full step   : {(time.perf_counter() - t0) / reps * 1e3:6.2f} ms")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
