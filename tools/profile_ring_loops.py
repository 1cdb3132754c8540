#!/usr/bin/env python
"""Ring-world loop-verification audit (VERDICT r4 items 1 & 3).

Runs the flagship ring-raycaster bench configuration once, then REPLAYS every
loop-cadence detection tick against the final keyframe DB (detection-exact:
lc.detect's candidate mask is one-sided in frame index and verification reads
only stored clouds — the same property the engine's multi-tick bunching
rests on) and fetches the full per-candidate record:

1. **Tranche-bound binding** (reference: the unbounded verify-until-accepted
   walk, loop_closure.hpp:96-123): how many ticks had more SC-gate candidates
   than the M = max_candidates*(1+verify_extra_tranches) bound while
   accepting fewer than max_candidates — and, replayed with a deep tranche
   budget, how many *additional* acceptances the unbounded walk would find.
2. **Rejection quality vs ground truth**: every verified-but-rejected
   candidate pair whose GT sensor positions overlap (< --gt-radius) is a
   LOST loop; every accepted pair without GT overlap is a FALSE accept.
3. **Coarse-fitness margin** (the early-reject gate design datum,
   LoopClosureConfig.verify_coarse_reject): the distribution of the hoisted
   coarse-phase plane RMS for (a) lanes the fine phase accepts and (b) lanes
   it rejects — the gap between max(a) and the bulk of (b) is the safe
   threshold band.

Usage (on the TPU, ~2-4 min after the prep cache exists):
  PYTHONPATH=".:$PYTHONPATH" python tools/profile_ring_loops.py
  ... --world corridor   # the uniform-density bench world instead
  ... --deep-tranches 40 # unbounded-walk emulation depth (M = 3*(1+40))
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--world", choices=["rings", "corridor"], default="rings")
    ap.add_argument("--frames", type=int, default=4500)
    ap.add_argument("--gt-radius", type=float, default=10.0,
                    help="GT sensor distance below which a candidate pair "
                    "is a genuine loop")
    ap.add_argument("--deep-tranches", type=int, default=15,
                    help="verify_extra_tranches for the unbounded-walk "
                    "replay on bound-hit ticks (0 = skip; compile time "
                    "grows with the unrolled tranche count)")
    ap.add_argument("--coarse-reject", type=float, default=0.0,
                    help="run the engine pass with this "
                    "verify_coarse_reject (audit a candidate threshold)")
    ap.add_argument("--out", default="/tmp/ring_loop_audit.json")
    args = ap.parse_args()

    rings = args.world == "rings"
    ds = 16384 if rings else 32768
    cache = (
        f"/tmp/lidar_bench_prep_f{args.frames}_r65536_d{ds}_v0.5_hv1_hn0"
        + ("_rings1" if rings else "")
    )
    cache_read = cache + ".npz"
    if not os.path.exists(cache_read) and not rings:
        alt = cache.replace("_hn0", "_hn1") + ".npz"
        if os.path.exists(alt):
            cache_read = alt
    if not os.path.exists(cache_read):
        log(f"prep cache missing: {cache_read} — run "
            f"{'BENCH_RINGS=1 ' if rings else ''}python bench.py once first")
        return 1

    import jax
    import jax.numpy as jnp

    from lidar_slam_tpu.config import ICPConfig, LoopClosureConfig, SlamConfig
    from lidar_slam_tpu.models import loop_closure as lc
    from lidar_slam_tpu.models import pipeline as pipe
    from lidar_slam_tpu.models.pipeline import SlamEngine
    from lidar_slam_tpu.utils.dataset import generate_trajectory, route_half_for
    from lidar_slam_tpu.utils.metrics import ate_rmse

    z = np.load(cache_read)
    scans = np.ascontiguousarray(z["scans"])
    counts = z["counts"]
    F = args.frames
    prepared = [scans[i, : counts[i]] for i in range(F)]
    gt = generate_trajectory(F, half=route_half_for(F))
    gt_pos = gt[:, :3, 3]

    # the flagship fast configuration (bench.py defaults)
    cfg = SlamConfig(
        max_raw_points=65536,
        max_points=ds,
        max_frames=F + 8,
        host_voxelize=True,
        dispatch_block=50,
        icp=ICPConfig(sample_points=4096, tolerance=3e-4, max_iterations=20,
                      warm_start=True),
        lc=LoopClosureConfig(
            verify_sample=4096, verify_tolerance=3e-4, yaw_seed=True,
            verify_coarse_iterations=3,
            verify_coarse_reject=args.coarse_reject,
        ),
        knn_backend="slab_pallas",
        optimize_midrun=False,
        normal_probe_stride=2,
    )
    log(f"engine pass ({args.world}, F={F}, ds={ds}, "
        f"coarse_reject={args.coarse_reject})...")
    eng = SlamEngine(cfg)
    eng.preload(prepared)
    t0 = time.perf_counter()
    eng.run_preloaded()
    eng.finalize()
    np.asarray(eng.state.n_poses)
    wall = time.perf_counter() - t0
    m = eng.metrics()
    ate = float(ate_rmse(eng.trajectory(), gt))
    log(f"engine: {F / wall:.1f} scans/s | ATE {ate:.3f} | "
        f"loops {m['loop_count']} | fired {m['verify_fired']} | "
        f"fine_fired {m['verify_fine_fired']} | "
        f"bound_hit {m['verify_bound_hit']}")

    # ---- per-tick replay against the final DB ------------------------------
    verify_nn1 = pipe._resolve_nn1(cfg.replace(knn_backend="auto"))
    db = eng.state.db
    cad, start = cfg.loop_check_every, cfg.loop_start_frame
    ticks = [f for f in range(start + 1, F) if f % cad == 0]

    def replay(q, lc_cfg):
        det = lc.detect(db, lc_cfg, cfg.sc, nn1_fn=verify_nn1,
                        query=jnp.int32(q))
        return jax.tree_util.tree_map(np.asarray, det)

    rows = []          # one row per VERIFIED candidate lane
    n_valid_per_tick = []
    bound_ticks = []
    t0 = time.perf_counter()
    for i, q in enumerate(ticks):
        det = replay(q, cfg.lc)
        nv = int(det.n_valid)
        n_valid_per_tick.append(nv)
        n_acc = int(det.accepted.sum())
        M = det.accepted.shape[0]
        if nv > M and n_acc < cfg.lc.max_candidates:
            bound_ticks.append(q)
        valid = np.isfinite(det.sc_distance)
        for k in np.nonzero(valid)[0]:
            mf = int(det.match_frame[k])
            rows.append(dict(
                q=q, m=mf,
                sc=float(det.sc_distance[k]),
                coarse=float(det.coarse_fitness[k]),
                fit=float(det.icp_fitness[k]),
                acc=bool(det.accepted[k]),
                gt_d=float(np.linalg.norm(gt_pos[q] - gt_pos[mf])),
            ))
        if i % 100 == 99:
            log(f"  replay {i + 1}/{len(ticks)} "
                f"({(i + 1) / (time.perf_counter() - t0):.1f} ticks/s)")

    rows_np = {k: np.array([r[k] for r in rows]) for k in rows[0]} if rows \
        else {}
    acc = rows_np.get("acc", np.zeros(0, bool))
    gt_d = rows_np.get("gt_d", np.zeros(0))
    genuine = gt_d < args.gt_radius
    fit = rows_np.get("fit", np.zeros(0))
    coarse = rows_np.get("coarse", np.zeros(0))

    lost = (~acc) & genuine          # verified, genuine, rejected
    false_acc = acc & ~genuine
    fin = np.isfinite(coarse)
    # the early-reject design datum: coarse RMS of eventually-accepted lanes
    # vs lanes the fine phase rejected
    c_acc = coarse[acc & fin]
    c_rej = coarse[(~acc) & fin]

    report = {
        "world": args.world,
        "engine": {
            "scans_per_sec": round(F / wall, 1),
            "ate_m": round(ate, 3),
            "loops": m["loop_count"],
            "verify_fired": m["verify_fired"],
            "verify_fine_fired": m["verify_fine_fired"],
            "verify_bound_hit": m["verify_bound_hit"],
            "coarse_reject": args.coarse_reject,
        },
        "ticks": len(ticks),
        "n_valid": {
            "mean": round(float(np.mean(n_valid_per_tick)), 1),
            "p90": int(np.percentile(n_valid_per_tick, 90)),
            "max": int(np.max(n_valid_per_tick)),
            "over_bound_ticks": len(bound_ticks),
        },
        "candidates_verified": len(rows),
        "accepted": int(acc.sum()),
        "rejected_genuine_lost": int(lost.sum()),
        "accepted_not_genuine": int(false_acc.sum()),
        "coarse_rms": {
            "accepted_max": round(float(c_acc.max()), 4) if len(c_acc) else None,
            "accepted_p99": round(float(np.percentile(c_acc, 99)), 4)
            if len(c_acc) else None,
            "rejected_p10": round(float(np.percentile(c_rej, 10)), 4)
            if len(c_rej) else None,
            "rejected_median": round(float(np.median(c_rej)), 4)
            if len(c_rej) else None,
            "rejected_below_accepted_max": int(
                (c_rej <= (c_acc.max() if len(c_acc) else np.inf)).sum()
            ) if len(c_rej) else 0,
        },
    }

    # ---- unbounded-walk emulation on the bound-hit ticks -------------------
    if args.deep_tranches > 0 and bound_ticks:
        import dataclasses

        deep_cfg = dataclasses.replace(
            cfg.lc, verify_extra_tranches=args.deep_tranches
        )
        extra_acc, extra_genuine = 0, 0
        log(f"deep replay of {len(bound_ticks)} bound-hit ticks "
            f"(M={(1 + args.deep_tranches) * cfg.lc.max_candidates})...")
        for q in bound_ticks:
            det = replay(q, deep_cfg)
            n_deep = int(det.accepted.sum())
            n_shallow = sum(
                1 for r in rows if r["q"] == q and r["acc"]
            )
            if n_deep > n_shallow:
                extra_acc += n_deep - n_shallow
                acck = np.nonzero(det.accepted)[0]
                for k in acck[n_shallow:]:
                    mf = int(det.match_frame[k])
                    if np.linalg.norm(gt_pos[q] - gt_pos[mf]) < args.gt_radius:
                        extra_genuine += 1
        report["unbounded_walk"] = {
            "bound_hit_ticks": len(bound_ticks),
            "extra_accepts": extra_acc,
            "extra_accepts_genuine": extra_genuine,
        }

    print(json.dumps(report, indent=2), flush=True)
    with open(args.out, "w") as f:
        json.dump({"report": report, "rows": rows}, f)
    log(f"full per-candidate rows -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
