#!/usr/bin/env python
"""Full-scale f64 reference-mirror LOOP DETECTION (VERDICT r4 item 2).

Runs the reference's exact loop-closure detection stack
(tools/reference_mirror.LoopClosureDetectorMirror: f64 Scan Context,
scan_context.hpp:44-142; the unbounded verify-until-accepted candidate walk,
loop_closure.hpp:66-126; node cadence + thresholds, slam_node.cpp:77-81,
159-167) over the SAME prepared dataset the flagship bench consumes — so the
full-scale accuracy anchor's loop constraints come from an implementation
that is fully independent of the engine's detector.

Detection is pose-independent (it reads only the stored clouds), so this
needs no odometry: each cadence tick's candidate set depends only on frames
older than the query, all available upfront. Resumable per tick.

Outputs a loops npz in the BENCH_SAVE_LOOPS format consumed by
tools/mirror_fullscale.py --loops (loop_from = match, loop_to = query,
loop_rel = transform mapping query sensor frame -> match frame).

Usage (host CPU, ~1-3 h for the ring world; checkpointed per tick):
  PYTHONPATH=".:$PYTHONPATH" python tools/mirror_detect.py --world rings
  PYTHONPATH=".:$PYTHONPATH" python tools/mirror_detect.py --world corridor
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--world", choices=["rings", "corridor"], default="rings")
    ap.add_argument("--prep", default="", help="override prep npz path")
    ap.add_argument("--frames", type=int, default=0, help="0 = all")
    ap.add_argument("--max-loop-factors", type=int, default=512)
    ap.add_argument("--min-points", type=int, default=1000)
    ap.add_argument("--sc-threshold", type=float, default=0.2)
    ap.add_argument("--fitness-threshold", type=float, default=0.3)
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from reference_mirror import LoopClosureDetectorMirror

    rings = args.world == "rings"
    ds = 16384 if rings else 32768
    prep = args.prep or (
        f"/tmp/lidar_bench_prep_f4500_r65536_d{ds}_v0.5_hv1_"
        + ("hn0_rings1" if rings else "hn1") + ".npz"
    )
    ckpt = args.ckpt or f"/tmp/mirror_detect_{args.world}_ckpt.npz"
    out = args.out or f"/tmp/mirror_loops_{args.world}.npz"
    if not os.path.exists(prep):
        print(f"prep cache missing: {prep}", flush=True)
        return 1
    z = np.load(prep)
    scans, counts = z["scans"], z["counts"]
    F = args.frames or len(scans)

    det = LoopClosureDetectorMirror(
        sc_distance_threshold=args.sc_threshold,
        icp_fitness_threshold=args.fitness_threshold,
    )
    loops: list[dict] = []
    start = 1
    if os.path.exists(ckpt):
        c = np.load(ckpt, allow_pickle=True)
        start = int(c["next_frame"])
        loops = list(c["loops"]) if len(c["loops"]) else []
        loops = [dict(l) for l in loops]
        print(f"resuming at frame {start} ({len(loops)} loops so far)",
              flush=True)

    # Rebuild detector DB state for frames < start (descriptors only —
    # cheap; the walk below re-adds from `start` on). Frame 0 is never
    # addFrame'd (slam_node.cpp:64-89).
    t0 = time.perf_counter()
    for i in range(1, F):
        curr = scans[i, : counts[i]].astype(np.float64)
        if len(curr) < args.min_points:
            continue  # skip guard returns before addFrame (slam_node.cpp:125-130)
        if i < start:
            det.add_frame(curr, i)
    if start > 1:
        print(f"DB rebuild to frame {start}: "
              f"{time.perf_counter() - t0:.0f}s", flush=True)

    t0 = time.perf_counter()
    for i in range(start, F):
        curr = scans[i, : counts[i]].astype(np.float64)
        if len(curr) >= args.min_points:
            det.add_frame(curr, i)
            if i % 10 == 0 and i > 50:
                found = det.detect()
                loops.extend(found)
        if i % 10 == 0:
            tmp = ckpt + ".tmp.npz"
            np.savez(tmp, next_frame=i + 1,
                     loops=np.array(loops, dtype=object))
            os.replace(tmp, ckpt)
            if i % 100 == 0:
                el = time.perf_counter() - t0
                rate = (i - start + 1) / max(el, 1e-9)
                print(
                    f"frame {i}/{F}: {len(loops)} loops | "
                    f"{rate:.2f} fr/s, ETA {(F - i) / max(rate, 1e-9) / 60:.0f} min",
                    flush=True,
                )

    # BENCH_SAVE_LOOPS-format output for mirror_fullscale.py --loops
    L = args.max_loop_factors
    kept = loops[:L]
    loop_from = np.zeros(L, np.int32)
    loop_to = np.zeros(L, np.int32)
    loop_rel = np.tile(np.eye(4, dtype=np.float32), (L, 1, 1))
    loop_valid = np.zeros(L, bool)
    for k, lc_hit in enumerate(kept):
        loop_from[k] = lc_hit["match_frame"]
        loop_to[k] = lc_hit["query_frame"]
        loop_rel[k] = np.asarray(lc_hit["transform"], np.float32)
        loop_valid[k] = True
    np.savez(out, loop_from=loop_from, loop_to=loop_to, loop_rel=loop_rel,
             loop_valid=loop_valid)
    summary = {
        "world": args.world,
        "frames": F,
        "loops_accepted": len(loops),
        "loops_kept": len(kept),
        "dropped_over_capacity": max(0, len(loops) - L),
        "out": out,
    }
    print(json.dumps(summary), flush=True)
    with open(out.replace(".npz", "_summary.json"), "w") as f:
        json.dump(
            {**summary,
             "pairs": [(l["query_frame"], l["match_frame"],
                        l["sc_distance"], l["icp_fitness"]) for l in loops]},
            f,
        )
    print(f"wall {time.perf_counter() - t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
