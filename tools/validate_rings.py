#!/usr/bin/env python
"""Reference-fidelity validation on realistic ring-pattern LiDAR data.

The north-star accuracy criterion is "ATE RMSE within 5% of the C++
reference" on real LiDAR (BASELINE.json; the reference validates on KITTI
seq 00 / Ouster OS1-64 — /root/reference/README.md:259-261). KITTI cannot be
downloaded in this image, so this harness runs BOTH implementations on the
closest reproducible stand-in — the 64-beam raycast simulator
(utils/dataset.render_scan_rings: azimuth x elevation ray grid, nearest-hit
occlusion, range noise, dropout) — at the reference's own fidelity settings:

- full-density source clouds (no ICP subsample), tolerance 1e-6, 50
  iterations, identity init (types.hpp:143-148, icp.hpp:174),
- f64 reference mirror (tools/reference_mirror.py — the line-by-line
  NumPy/SciPy reproduction of the reference odometry math) on the same scans,
- the TPU engine in odometry-only mode (apples-to-apples with the mirror,
  which has no GTSAM backend), and the full engine with loop closure.

Outputs an ATE/RPE table + per-frame delta agreement, and writes
docs/VALIDATION.md.

Usage: PYTHONPATH=. python tools/validate_rings.py [--frames 1000]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--beams", type=int, default=64)
    ap.add_argument("--azimuth", type=int, default=1024)
    ap.add_argument("--skip-mirror", action="store_true")
    ap.add_argument("--mirror-only", action="store_true",
                    help="render + run the f64 mirror, cache, and exit "
                    "(the engine phase needs the TPU; the mirror is "
                    "host-CPU only)")
    ap.add_argument("--cache", default="/tmp/validate_rings_cache",
                    help="directory for scan/mirror caches keyed by config")
    ap.add_argument("--out", default="docs/VALIDATION.md")
    args = ap.parse_args()

    from lidar_slam_tpu.config import ICPConfig, SlamConfig
    from lidar_slam_tpu.models.pipeline import SlamEngine
    from lidar_slam_tpu.utils.dataset import (
        generate_trajectory,
        generate_world_geom,
        render_scan_rings,
        route_half_for,
    )
    from lidar_slam_tpu.utils.metrics import ate_rmse, rpe

    n = args.frames
    half = route_half_for(n)
    geom = generate_world_geom(0, route_half=half)
    gt = generate_trajectory(n, half=half)
    rng = np.random.default_rng(0)

    os.makedirs(args.cache, exist_ok=True)
    tag = f"f{n}_b{args.beams}_a{args.azimuth}"
    scan_cache = os.path.join(args.cache, f"scans_{tag}.npz")
    if os.path.exists(scan_cache):
        print(f"loading cached scans: {scan_cache}")
        z = np.load(scan_cache)
        scans = [z[f"s{i}"] for i in range(n)]
    else:
        print(f"rendering {n} ring scans (64 x {args.azimuth} rays, occlusion)...")
        t0 = time.perf_counter()
        scans = [
            render_scan_rings(geom, gt[i], rng, n_beams=args.beams,
                              n_azimuth=args.azimuth)
            for i in range(n)
        ]
        print(f"  {time.perf_counter() - t0:.0f}s")
        np.savez(scan_cache, **{f"s{i}": s for i, s in enumerate(scans)})
    sizes = np.array([len(s) for s in scans])
    print(
        f"  scan sizes min {sizes.min()} "
        f"mean {int(sizes.mean())} max {sizes.max()}"
    )

    results = {}

    # --- f64 reference mirror (odometry only, reference defaults) ---------
    mirror_poses = None
    mirror_stats: list = []
    if not args.skip_mirror:
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from reference_mirror import run_odometry

        mirror_cache = os.path.join(args.cache, f"mirror_{tag}.npz")
        if os.path.exists(mirror_cache):
            z = np.load(mirror_cache)
            mirror_poses, wall = z["poses"], float(z["wall"])
            if "errs" in z:
                mirror_stats = [(e, 0, True) for e in z["errs"]]
            print(f"loaded cached mirror poses: {mirror_cache}")
        else:
            print("running f64 reference mirror (50 iters, tol 1e-6, f64 KD-tree)...")
            t0 = time.perf_counter()
            mirror_poses, mirror_stats = run_odometry(
                scans, voxel_size=0.5, verbose=True
            )
            wall = time.perf_counter() - t0
            np.savez(mirror_cache, poses=mirror_poses, wall=wall,
                     errs=np.array([s[0] for s in mirror_stats]))
        ate = ate_rmse(mirror_poses.astype(np.float32), gt)
        t_err, r_err = rpe(mirror_poses.astype(np.float32), gt)
        results["mirror (f64 reference odometry)"] = (ate, t_err, r_err, n / wall)
        print(f"  mirror: {wall:.0f}s, ATE {ate:.3f} m")
    if args.mirror_only:
        print("mirror-only: cached; run again without --mirror-only for the "
              "engine phase")
        return 0

    # --- TPU engine at reference fidelity ----------------------------------
    cap = 1 << int(np.ceil(np.log2(sizes.max())))

    def run_engine(loop_closure: bool):
        cfg = SlamConfig(
            max_raw_points=cap,
            max_points=32768,
            max_frames=n + 8,
            # reference fidelity: full density, tol 1e-6, 50 iters, identity
            # init (types.hpp:143-148; icp.hpp:174)
            icp=ICPConfig(max_iterations=50, tolerance=1e-6,
                          sample_points=0, warm_start=False),
            dispatch_block=10,
            loop_check_every=10 if loop_closure else 10 * n,
        )
        eng = SlamEngine(cfg)
        # resident mode: upload all scans BEFORE the first result fetch (a
        # fetch permanently degrades upload bandwidth ~30x on the tunneled
        # runtime — see pipeline.make_resident_block_fn)
        eng.preload(scans)
        t0 = time.perf_counter()
        eng.run_preloaded()
        if loop_closure:
            eng.finalize()
        import jax

        jax.block_until_ready(eng.state.poses)
        wall = time.perf_counter() - t0
        traj = eng.trajectory()
        ate = ate_rmse(traj, gt)
        t_err, r_err = rpe(traj, gt)
        return traj, (ate, t_err, r_err, n / wall), eng

    print("running TPU engine (odometry only, reference fidelity)...")
    traj_odo, res_odo, _ = run_engine(loop_closure=False)
    results["engine f32 TPU (odometry only)"] = res_odo
    print(f"  ATE {res_odo[0]:.3f} m at {res_odo[3]:.1f} scans/s")

    print("running TPU engine (full pipeline incl. loop closure)...")
    traj_full, res_full, eng = run_engine(loop_closure=True)
    results["engine f32 TPU (full SLAM)"] = res_full
    m = eng.metrics()
    print(
        f"  ATE {res_full[0]:.3f} m at {res_full[3]:.1f} scans/s, "
        f"loops {m['loop_count']}"
    )

    # --- mirror + f64 backend = full-SLAM reference stand-in ----------------
    # The reference's full pipeline is frontend + GTSAM LM
    # (slam_node.cpp:118-185). The mirror covers the frontend; its backend
    # stand-in is pose_graph.optimize_host — the same f64 LM / factor model
    # GTSAM runs (pose_graph.cpp:81-171 semantics: prior + fitness-scaled
    # odometry factors + loop factors, initial estimates = raw odometry
    # chain). Loop constraints are shared from the engine's accepted
    # detections (transform + endpoints): Scan Context retrieval is
    # deterministic geometry, and re-mirroring the verify-ICP in f64 would
    # test the detector, not the backend.
    mirror_full_ate = None
    if mirror_poses is not None:
        import jax.numpy as jnp

        from lidar_slam_tpu.models import pose_graph as pg

        lf = np.asarray(eng.state.pg.loop_from)
        lt = np.asarray(eng.state.pg.loop_to)
        lrel = np.asarray(eng.state.pg.loop_rel)
        lval = np.asarray(eng.state.pg.loop_valid)
        F = len(mirror_poses)
        odom_rel = np.einsum(
            "nij,njk->nik", np.linalg.inv(mirror_poses[:-1]), mirror_poses[1:]
        )
        # fitness-scaled odometry sigmas (pose_graph.cpp:88); stats rows are
        # (err, iters, converged) for every non-skipped frame
        errs = np.zeros((F,), np.float64)
        errs[1 : 1 + len(mirror_stats)] = [s[0] for s in mirror_stats]
        mstate = pg.PoseGraphState(
            poses=jnp.asarray(mirror_poses, jnp.float32),
            n_poses=jnp.int32(F),
            odom_rel=jnp.asarray(
                np.concatenate([np.eye(4)[None], odom_rel], 0), jnp.float32
            ),
            odom_valid=jnp.asarray(
                np.arange(F) >= 1
            ),
            odom_scale=jnp.asarray(1.0 + 10.0 * errs, jnp.float32),
            loop_from=jnp.asarray(lf),
            loop_to=jnp.asarray(lt),
            loop_rel=jnp.asarray(lrel, jnp.float32),
            loop_valid=jnp.asarray(lval),
            n_loops=jnp.int32(int(lval.sum())),
            n_loops_dropped=jnp.int32(0),
        )
        t0 = time.perf_counter()
        mres = pg.optimize_host(mstate, eng.config.pg)
        mwall = time.perf_counter() - t0
        mirror_full = np.asarray(mres.poses)
        mirror_full_ate = ate_rmse(mirror_full.astype(np.float32), gt)
        t_err, r_err = rpe(mirror_full.astype(np.float32), gt)
        results["mirror + f64 backend (full SLAM)"] = (
            mirror_full_ate, t_err, r_err, float("nan"),
        )
        print(
            f"  mirror full SLAM (f64 backend, {int(lval.sum())} loops): "
            f"ATE {mirror_full_ate:.3f} m ({mwall:.1f}s, "
            f"{int(mres.iterations)} LM iters, conv={bool(mres.converged)})"
        )

    # --- report -------------------------------------------------------------
    lines = [
        "# Accuracy validation — realistic ring-LiDAR, reference fidelity",
        "",
        f"Dataset: {n} frames, 64-beam raycast simulator "
        f"(`utils/dataset.render_scan_rings`: {args.beams}x{args.azimuth} ray"
        " grid, nearest-hit occlusion, range noise 2 cm, 2% dropout), route "
        f"radius {half:.0f} m (~{n * 1.2 / 1000:.1f} km, final 1/8 revisits "
        "the start). KITTI itself cannot be downloaded in this image; this "
        "is the closest reproducible stand-in for the data the reference "
        "validates on (`/root/reference/README.md:259-261`).",
        "",
        "All runs at the REFERENCE's fidelity settings: full-density source",
        "clouds, |delta-error| tolerance 1e-6, 50 ICP iterations, identity",
        "init (`types.hpp:143-148`, `icp.hpp:174`), 0.5 m voxels.",
        "",
        "| pipeline | ATE RMSE (m) | RPE trans (m) | RPE rot (rad) | scans/s |",
        "|---|---|---|---|---|",
    ]
    for name, (ate, t_err, r_err, sps) in results.items():
        lines.append(
            f"| {name} | {ate:.3f} | {t_err:.4f} | {r_err:.5f} | {sps:.1f} |"
        )
    if mirror_poses is not None:
        m_ate = results["mirror (f64 reference odometry)"][0]
        e_ate = results["engine f32 TPU (odometry only)"][0]
        ratio = e_ate / max(m_ate, 1e-9)
        lines += [
            "",
            f"Engine-odometry ATE is **{ratio:.2f}x** the f64 reference "
            "mirror's (north-star criterion: within 5%, i.e. <= 1.05x — "
            f"{'MET' if ratio <= 1.05 else 'NOT MET'}).",
        ]
        if mirror_full_ate is not None:
            full_ratio = results["engine f32 TPU (full SLAM)"][0] / max(
                mirror_full_ate, 1e-9
            )
            lines += [
                "",
                "**Full-SLAM parity (frontend + backend):** the mirror's "
                "backend stand-in is `pose_graph.optimize_host` — the same "
                "f64 LM / factor model GTSAM runs (prior + fitness-scaled "
                "odometry + loops, initial estimates = odometry chain, "
                "`pose_graph.cpp:81-171`), applied to the mirror's f64 "
                "odometry with the engine's accepted loop constraints. "
                f"Engine full-SLAM ATE is **{full_ratio:.2f}x** the "
                "mirror-with-backend's "
                f"({'MET' if full_ratio <= 1.05 else 'NOT MET'}, "
                "criterion <= 1.05x).",
            ]
        # per-frame odometry agreement (delta-vs-delta, mirror as reference)
        rel_m = np.einsum(
            "nij,njk->nik", np.linalg.inv(mirror_poses[:-1]), mirror_poses[1:]
        )
        rel_e = np.einsum(
            "nij,njk->nik",
            np.linalg.inv(traj_odo[:-1].astype(np.float64)),
            traj_odo[1:].astype(np.float64),
        )
        d = np.einsum("nij,njk->nik", np.linalg.inv(rel_m), rel_e)
        dt = np.linalg.norm(d[:, :3, 3], axis=1)
        tr = np.clip((np.trace(d[:, :3, :3], axis1=1, axis2=2) - 1) / 2, -1, 1)
        dr = np.arccos(tr)
        lines += [
            "",
            "Per-frame odometry delta agreement (engine vs mirror, same "
            "scans): translation mean "
            f"{dt.mean() * 1e3:.2f} mm / p99 {np.percentile(dt, 99) * 1e3:.2f}"
            f" mm; rotation mean {np.degrees(dr.mean()) * 1e3:.2f} mdeg / p99 "
            f"{np.degrees(np.percentile(dr, 99)) * 1e3:.2f} mdeg.",
        ]
    lines.append("")
    out = args.out
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")
    print("\n".join(lines))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
