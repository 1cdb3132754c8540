#!/usr/bin/env python
"""Isolate where the full-scale detect/loop pass time goes.

Times (chained dispatches, varied inputs, honest device->host sync) a ladder
of ever-larger slices of the loop_fn program at F=4608 / N=32768 shapes:

  0. donation floor: state in -> state out with one scalar bump
  1. + sc_distances + masked top_k
  2. + candidate cloud/mask/normal gathers
  3. + full lc.detect (gated verification, no candidates)
  4. + factor fori_loop  (pg only)
  5. full loop_fn (detect + factors + gated optimize)

Usage: PYTHONPATH=. python tools/profile_detect.py [--frames 4608] [--ds 32768]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4608)
    ap.add_argument("--ds", type=int, default=32768)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lidar_slam_tpu.config import ICPConfig, LoopClosureConfig, SlamConfig
    from lidar_slam_tpu.models import loop_closure as lc
    from lidar_slam_tpu.models import pipeline as pipe
    from lidar_slam_tpu.models import pose_graph as pg
    from lidar_slam_tpu.ops.scan_context import sc_distances
    from lidar_slam_tpu.types import PointCloud

    print(f"backend: {jax.default_backend()}")
    F, DS = args.frames, args.ds
    cfg = SlamConfig(
        max_raw_points=131072, max_points=DS, max_frames=F, host_voxelize=True,
        icp=ICPConfig(sample_points=8192, tolerance=1e-4, max_iterations=20),
        lc=LoopClosureConfig(verify_sample=4096, verify_tolerance=1e-4),
    )

    state = pipe.init_state(cfg)
    # populate DB with random descriptors/clouds (distances huge -> no cands).
    # Generate ON DEVICE: host-uploading the multi-GB cloud/normal buffers
    # rides the tunnel's multi-GB transfer cliff (~12 MB/s -> many minutes of
    # init before the first measurement).
    db = state.db
    key = jax.random.PRNGKey(0)
    kd, kc = jax.random.split(key)
    desc = jax.random.normal(kd, (F, 20, 60), jnp.float32)
    db = db._replace(
        desc=desc,
        desc_norm=jnp.sqrt(jnp.sum(desc * desc, axis=(1, 2))),
        clouds=jax.random.normal(kc, (F, cfg.lc_points, 3), jnp.float32) * 30,
        cloud_mask=jnp.ones((F, cfg.lc_points), bool),
        normals=jnp.zeros((F, cfg.lc_points, 3), jnp.float32).at[:, :, 2].set(1.0),
        in_db=jnp.ones((F,), bool),
        last_frame=jnp.int32(F - 1),
    )
    state = state._replace(db=db, n_poses=jnp.int32(F))
    np.asarray(state.n_poses)

    def timed(label, fn, reps=args.reps):
        nonlocal state
        t0 = time.perf_counter()
        state, out = fn(state, jnp.int32(0))
        np.asarray(out)
        print(f"  {label} compile+first: {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for r in range(reps):
            state, out = fn(state, jnp.int32(r + 1))
        np.asarray(out)
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"  {label}: {dt:.2f} ms")
        return dt

    jd = functools.partial(jax.jit, donate_argnums=0)

    @jd
    def lvl0(st, i):
        return st._replace(loop_count=st.loop_count + 1), st.loop_count + i

    @jd
    def lvl1(st, i):
        q = st.db.last_frame - (i % 7)
        dist, shift = sc_distances(st.db.desc[q], st.db.desc, st.db.desc_norm)
        masked = jnp.where(st.db.in_db, dist, jnp.inf)
        _, idx = jax.lax.top_k(-masked, 6)
        return st._replace(loop_count=st.loop_count + 1), idx

    from lidar_slam_tpu.ops.scan_context import sc_distances_ring_prefiltered

    def make_lvl1p(k):
        @jd
        def lvl1p(st, i):
            q = st.db.last_frame - (i % 7)
            dist, shift = sc_distances_ring_prefiltered(
                st.db.desc[q], st.db.desc, st.db.desc_norm, k=k
            )
            masked = jnp.where(st.db.in_db, dist, jnp.inf)
            _, idx = jax.lax.top_k(-masked, 6)
            return st._replace(loop_count=st.loop_count + 1), idx

        return lvl1p

    @jd
    def lvl2(st, i):
        q = st.db.last_frame - (i % 7)
        dist, shift = sc_distances(st.db.desc[q], st.db.desc, st.db.desc_norm)
        masked = jnp.where(st.db.in_db, dist, jnp.inf)
        _, idx = jax.lax.top_k(-masked, 6)
        idx = idx.astype(jnp.int32)
        cc = st.db.clouds[idx]
        cm = st.db.cloud_mask[idx]
        cn = st.db.normals[idx]
        qc = st.db.clouds[q]
        out = jnp.sum(cc) + jnp.sum(cm) + jnp.sum(cn) + jnp.sum(qc)
        return st._replace(loop_count=st.loop_count + 1), out

    @jd
    def lvl3(st, i):
        det = lc.detect(st.db, cfg.lc, cfg.sc, expect_query=jnp.int32(-5) - i)
        return st._replace(loop_count=st.loop_count + 1), det.accepted

    @jd
    def lvl4(st, i):
        det = lc.detect(st.db, cfg.lc, cfg.sc, expect_query=jnp.int32(-5) - i)

        def add_one(k, pg_state):
            return pg.add_loop(
                pg_state, det.match_frame[k], det.query_frame,
                det.transform[k], valid=det.accepted[k],
            )

        pg_state = jax.lax.fori_loop(0, det.accepted.shape[0], add_one, st.pg)
        return st._replace(pg=pg_state, loop_count=st.loop_count + 1), det.accepted

    loop_fn = pipe.make_loop_fn(cfg)

    def lvl5(st, i):
        st, det = loop_fn(st, jnp.int32(-5) - i)
        return st, det.accepted

    # lvl6/7: the ENGINE's actual tick path — make_loop_fn_split (no
    # donation, multi-GB state as plain inputs, small outputs). lvl6 =
    # non-firing (expect_query mismatch rejects all candidates); lvl7 =
    # FIRING worst case: the query descriptor matches 6 gap-satisfying DB
    # rows, but the random clouds never converge, so the vmapped verify
    # runs its full 30-iteration budget + the in-graph optimize cond fires.
    split_fn = pipe.make_loop_fn_split(cfg)

    def lvl6(st, i):
        (pg_s, poses, lc_n, vf_n, vff_n, vbh_n, pend), det = split_fn(
            st, jnp.int32(-5) - i)
        return st._replace(pg=pg_s, poses=poses, loop_count=lc_n,
                           verify_fired=vf_n, verify_fine_fired=vff_n,
                           verify_bound_hit=vbh_n,
                           pending_optimize=pend), det.accepted

    def make_firing_state(st):
        d0 = st.db.desc[0]
        desc2 = st.db.desc.at[F - 1].set(d0)
        for r in range(1, 7):
            desc2 = desc2.at[r * 100].set(
                d0 + 0.001 * st.db.desc[r * 100]
            )
        db2 = st.db._replace(
            desc=desc2,
            desc_norm=jnp.sqrt(jnp.sum(desc2 * desc2, axis=(1, 2))),
        )
        return st._replace(db=db2)

    def lvl7(st, i):
        # vary poses per rep — identical dispatches are served from the
        # tunnel runtime's cache and would time as ~0
        st = st._replace(poses=st.poses + (i.astype(jnp.float32) * 1e-6))
        (pg_s, poses, lc_n, vf_n, vff_n, vbh_n, pend), det = split_fn(
            st, jnp.int32(F - 1))
        return st._replace(pg=pg_s, poses=poses, loop_count=lc_n,
                           verify_fired=vf_n, verify_fine_fired=vff_n,
                           verify_bound_hit=vbh_n,
                           pending_optimize=pend), det.accepted

    timed("lvl0 donation floor      ", lvl0)
    timed("lvl1 +sc_distances+topk  ", lvl1)
    # the prefilter trade's COST side (recall side: measure_prefilter_recall)
    timed("lvl1p prefilter k=128    ", make_lvl1p(128))
    timed("lvl1p prefilter k=256    ", make_lvl1p(256))
    timed("lvl2 +cand gathers       ", lvl2)
    timed("lvl3 full detect (gated) ", lvl3)
    timed("lvl4 +factor fori_loop   ", lvl4)
    timed("lvl5 full loop_fn        ", lvl5)
    timed("lvl6 split tick, no cands", lvl6)
    state = make_firing_state(state)
    np.asarray(state.db.desc_norm[0])
    timed("lvl7 split tick, FIRING  ", lvl7)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
