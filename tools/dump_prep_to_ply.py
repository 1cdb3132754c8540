#!/usr/bin/env python
"""Dump a bench prep cache (the prepared voxelized clouds) to a .ply frame
directory + poses_gt.txt, so the product CLI can run on EXACTLY the scans
the bench measures (the round-4 CLI-parity methodology, docs/PERF.md
"The benchmarked configuration through the product CLI").

Usage:
  PYTHONPATH=. python tools/dump_prep_to_ply.py --world rings \
      [--frames 1000] [--out /tmp/ring_scans]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--world", choices=["rings", "corridor"], default="rings")
    ap.add_argument("--prep", default="", help="override prep npz path")
    ap.add_argument("--frames", type=int, default=0, help="0 = all")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from lidar_slam_tpu.utils.dataset import generate_trajectory, route_half_for
    from lidar_slam_tpu.utils.io import save_ply

    rings = args.world == "rings"
    ds = 16384 if rings else 32768
    prep = args.prep or (
        f"/tmp/lidar_bench_prep_f4500_r65536_d{ds}_v0.5_hv1_"
        + ("hn0_rings1" if rings else "hn1") + ".npz"
    )
    out = args.out or f"/tmp/{args.world}_scans"
    if not os.path.exists(prep):
        print(f"prep cache missing: {prep} (run bench.py first)")
        return 1
    z = np.load(prep)
    scans, counts = z["scans"], z["counts"]
    F = args.frames or len(scans)
    os.makedirs(out, exist_ok=True)
    for i in range(F):
        save_ply(os.path.join(out, f"{i:010d}.ply"),
                 scans[i, : counts[i]].astype(np.float32))
        if (i + 1) % 500 == 0:
            print(f"  {i + 1}/{F}", flush=True)
    # the bench worlds are deterministic: regenerate the GT trajectory with
    # the same parameters bench.py uses (the cache's full route length)
    half = route_half_for(len(scans))
    gt = generate_trajectory(len(scans), half=half)[:F]
    with open(os.path.join(out, "poses_gt.txt"), "w") as f:
        for T in gt:
            f.write(" ".join(f"{v:.9e}" for v in np.asarray(T)[:3].ravel()))
            f.write("\n")
    print(f"wrote {F} .ply frames + poses_gt.txt -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
