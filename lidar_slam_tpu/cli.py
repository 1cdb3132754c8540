"""Command-line driver.

Replaces the reference's ROS2 launch + node entry point (slam.launch.py,
slam_node.cpp:341-350). Flags mirror the ROS parameter names
(slam_node.cpp:17-25, README table :203-213): data_dir, voxel_size,
playback_rate, max_iterations, tolerance, grid_resolution, height_min,
height_max, max_range. Instead of RViz topics, results are exported as
artifacts (trajectory / map.ply / occupancy / metrics.jsonl).

Subcommands:
  run           — full SLAM over a directory of .ply/.bin frames
  convert       — KITTI .bin -> .ply (replaces tools/convert_to_ply.cpp)
  make-dataset  — generate the synthetic loop dataset
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _apply_mode(base, mode):
    """--fast / --fidelity mode presets (explicit flags override them).

    fidelity = the reference's exact runtime settings (types.hpp:143-148,
      icp.hpp:174 identity init, slam_node.cpp:112-115 optimize-on-find,
      full-density correspondence, exact 1-NN) — the configuration the
      parity/validation claims are measured at.
    fast = the benchmarked throughput configuration (bench.py defaults /
      docs/PERF.md): warm-started ICP on a 4096-point source subsample,
      tol 3e-4 / 20 iters, fused slab-match Pallas 1-NN, cadence-spanning
      dispatch blocks, deferred (finalize-time) optimization — equivalence
      measured and disclosed per knob in PERF.md.
    """
    import dataclasses

    if mode == "fidelity":
        return base.replace(
            icp=dataclasses.replace(
                base.icp, max_iterations=50, tolerance=1e-6,
                sample_points=0, target_points=0, warm_start=False,
            ),
            lc=dataclasses.replace(
                base.lc, verify_sample=0, verify_tolerance=1e-6,
                verify_coarse_iterations=0, yaw_seed=False,
            ),
            knn_backend="auto",
            optimize_midrun=True,
        )
    if mode == "fast":
        return base.replace(
            icp=dataclasses.replace(
                base.icp, max_iterations=20, tolerance=3e-4,
                sample_points=4096, warm_start=True,
            ),
            lc=dataclasses.replace(
                base.lc, verify_sample=4096, verify_tolerance=3e-4,
                verify_coarse_iterations=3, yaw_seed=True,
                verify_coarse_reject=0.6,
            ),
            knn_backend="slab_pallas",
            dispatch_block=50,
            optimize_midrun=False,
            normal_probe_stride=2,
        )
    return base


def _build_config(args):
    import dataclasses

    from .config import (
        OccupancyGridConfig,
        SlamConfig,
        tiny_config,
    )

    if args.preset == "tiny":
        base = tiny_config()
    else:
        base = SlamConfig()

    base = _apply_mode(base, args.mode)
    cfg = base.replace(
        voxel_size=args.voxel_size,
        icp=dataclasses.replace(
            base.icp,
            max_iterations=(
                args.max_iterations if args.max_iterations is not None
                else base.icp.max_iterations
            ),
            tolerance=(
                args.tolerance if args.tolerance is not None
                else base.icp.tolerance
            ),
        ),
        grid=OccupancyGridConfig(
            resolution=args.grid_resolution,
            height_min=args.height_min,
            height_max=args.height_max,
            max_range=args.max_range,
            grid_dim=base.grid.grid_dim,
        ),
    )
    if args.max_points:
        # full-size verification clouds unless --lc-points narrows them
        cfg = cfg.replace(max_points=args.max_points, lc_cloud_points=0)
    if getattr(args, "lc_points", 0):
        cfg = cfg.replace(lc_cloud_points=args.lc_points)
    if args.max_raw_points:
        cfg = cfg.replace(max_raw_points=args.max_raw_points)
    if args.max_frames:
        cfg = cfg.replace(max_frames=args.max_frames)
    if args.knn_backend:
        cfg = cfg.replace(knn_backend=args.knn_backend)
    if args.icp_sample is not None:
        cfg = cfg.replace(
            icp=dataclasses.replace(cfg.icp, sample_points=args.icp_sample)
        )
    if args.warm_start:
        cfg = cfg.replace(icp=dataclasses.replace(cfg.icp, warm_start=True))
    if args.dispatch_block is not None:
        cfg = cfg.replace(dispatch_block=args.dispatch_block)
    if args.normal_method:
        cfg = cfg.replace(normal_method=args.normal_method)
    if args.probe_stride:
        cfg = cfg.replace(normal_probe_stride=args.probe_stride)
    if args.normal_stride:
        cfg = cfg.replace(normal_stride=args.normal_stride)
    if args.no_midrun_optimize:
        cfg = cfg.replace(optimize_midrun=False)
    return cfg


def cmd_run(args) -> int:
    import numpy as np  # noqa: F401

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)

    from .models.pipeline import SlamEngine
    from .utils import export
    from .utils.io import discover_frames
    from .utils.native import FrameLoader

    frames = discover_frames(args.data_dir)
    if not frames:
        print(f"No frames found in {args.data_dir}", file=sys.stderr)
        return 1
    if args.frames:
        frames = frames[: args.frames]

    os.makedirs(args.out_dir, exist_ok=True)
    cfg = _build_config(args)
    if args.resume:
        # the checkpoint's arrays pin every capacity — auto-sizing
        # max_frames here would break load_state's shape check whenever
        # the checkpoint was written under a different dataset length;
        # pass --max-frames (and --max-points) to match the checkpoint
        pass
    elif not args.max_frames:
        # right-size the keyframe-DB capacity to the dataset (+ slack): the
        # DB-linear costs (SC retrieval matmul, candidate gathers, finalize
        # occupancy rebuild) and ~0.8 GiB of HBM per 1,000 frames of
        # capacity otherwise pay for empty rows (the 4,608 default is the
        # full-KITTI bench shape)
        cfg = cfg.replace(max_frames=len(frames) + 8)
    elif cfg.max_frames < len(frames):
        cfg = cfg.replace(max_frames=len(frames) + 8)
    if not args.no_host_voxelize:
        # voxelize (and estimate normals) in the loader workers — off the
        # device critical path
        cfg = cfg.replace(host_voxelize=True)
        from .utils.native import native_available

        if cfg.normal_method == "radius" and native_available():
            cfg = cfg.replace(host_normals=True)
    if not args.max_raw_points:
        # auto-size the raw capacity from the first frame (truncation would
        # spatially bias the scan — render/driver order is not shuffled)
        from .utils.io import load_scan

        n0 = len(load_scan(frames[0][1]))
        cap = 1 << max(int(np.ceil(np.log2(max(n0, 1024)))), 10)
        if cap != cfg.max_raw_points:
            cfg = cfg.replace(max_raw_points=cap)
    engine = None
    start_frame = 0
    if args.resume:
        # the checkpoint requires an identical config, so auto-sizing from
        # the data is skipped on resume (pass --max-points / --max-frames
        # to match the checkpoint's capacities)
        engine = SlamEngine(cfg)
        engine.load_checkpoint(args.resume)
        start_frame = engine.n_frames
        print(f"resumed from {args.resume} at frame {start_frame}")

    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)

    period = 1.0 / args.playback_rate if args.playback_rate > 0 else 0.0
    if cfg.host_voxelize:
        loader = FrameLoader(
            [p for _, p in frames], cap=cfg.max_points, window=8, threads=4,
            voxel=cfg.voxel_size, raw_cap=cfg.max_raw_points,
            normals_radius=(
                cfg.effective_normal_radius if cfg.host_normals else 0.0
            ),
            start=start_frame,
        )
    else:
        loader = FrameLoader(
            [p for _, p in frames], cap=cfg.max_raw_points, window=8,
            threads=2, start=start_frame,
        )
    t_start = time.perf_counter()
    if args.resident:
        # The benchmarked steady state: one upfront upload, scalar-only
        # dispatches (models/pipeline.preload docstring). Host prep (load /
        # voxelize / normals) is timed and reported separately — the total
        # wall below includes it.
        for flag, name in (
            (args.checkpoint_every, "--checkpoint-every"),
            (args.export_every, "--export-every"),
            (args.playback_rate, "--playback-rate"),
        ):
            if flag:
                print(
                    f"{name} only applies to the streaming path and is "
                    "ignored with --resident (the resident run dispatches "
                    "the whole dataset without per-frame host control)",
                    file=sys.stderr,
                )
        t0 = time.perf_counter()
        prepared, prep_normals = [], [] if cfg.host_normals else None
        for i in range(start_frame, len(frames)):
            if cfg.host_normals:
                p, nr = loader.get_with_normals(i)
                prep_normals.append(nr)
            else:
                p = loader.get(i)
            prepared.append(p)
        t_prep = time.perf_counter() - t0
        print(f"prep: {t_prep:.1f}s", file=sys.stderr, flush=True)
        if engine is None and not args.max_points:
            # right-size the cloud pad to the ACTUAL prepared maximum (next
            # power of two, floor 4096 to keep the slab/normal windows
            # covered): sparse-sensor scans (e.g. 64-beam ring LiDAR
            # voxelizes to <= ~11k points) otherwise pay every 1-NN /
            # normals / verify kernel for phantom pad rows — measured
            # bit-identical and +71% scans/s on the ring bench world
            mx = max(len(p) for p in prepared) if prepared else 1024
            cap = max(4096, 1 << int(np.ceil(np.log2(max(mx, 1)))))
            if cap < cfg.max_points:
                print(f"auto-sized max_points: {cfg.max_points} -> {cap} "
                      f"(max prepared cloud {mx})", file=sys.stderr)
                cfg = cfg.replace(max_points=cap)
        if engine is None:
            engine = SlamEngine(cfg)
        print(
            f"config: voxel={cfg.voxel_size} max_points={cfg.max_points} "
            f"frames={len(frames)} backend={cfg.knn_backend}"
        )
        t0 = time.perf_counter()
        engine.preload(prepared, normals=prep_normals, frame0=start_frame)
        t_up = time.perf_counter() - t0
        print(f"upload: {t_up:.1f}s", file=sys.stderr, flush=True)
        import numpy as _np

        if args.warmup_run and start_frame:
            print("--warmup-run ignored with --resume (reset would discard "
                  "the restored state)", file=sys.stderr)
        t_warm = 0.0
        if args.warmup_run and not start_frame:
            # bench.py methodology: one untimed pass absorbs the per-process
            # program compile/deserialize/load cost (~40-60 s over the
            # tunnel), then the timed pass measures steady-state throughput
            t0 = time.perf_counter()
            engine.run_preloaded()
            engine.finalize()
            _np.asarray(engine.state.n_poses)
            t_warm = time.perf_counter() - t0
            print(
                f"warmup run (compile/load + run): {t_warm:.1f}s",
                file=sys.stderr, flush=True,
            )
            engine.reset()
        t0 = time.perf_counter()
        engine.run_preloaded()
        engine.finalize()
        _np.asarray(engine.state.n_poses)  # honest device sync
        t_dev = time.perf_counter() - t0
        print(
            f"resident run: prep {t_prep:.1f}s + upload {t_up:.1f}s + device "
            f"{t_dev:.1f}s ({(len(frames) - start_frame) / t_dev:.1f} "
            "scans/s device-side)"
        )
    else:
        if engine is None:
            engine = SlamEngine(cfg)
            print(
                f"config: voxel={cfg.voxel_size} max_points={cfg.max_points} "
                f"frames={len(frames)} backend={cfg.knn_backend}"
            )
        t_warm = 0.0
        if args.warmup_run and start_frame:
            print("--warmup-run ignored with --resume (reset would discard "
                  "the restored state)", file=sys.stderr)
        if args.warmup_run and not start_frame:
            # Streaming warmup: push enough frames to compile/load every
            # program the steady state uses (init, block, multi-tick, the
            # per-step partial-tail path), then reset. The warmup pass makes
            # NO device->host fetch, so the timed pass's per-block uploads
            # keep the healthy-bandwidth path (docs/PERF.md
            # "transfer-free steady state" items 1-2).
            t0 = time.perf_counter()
            blk = max(cfg.dispatch_block, 1)
            wn = min(len(frames), 3 * blk + cfg.loop_check_every + 2)
            for i in range(wn):
                if cfg.host_normals:
                    p, nr = loader.get_with_normals(i)
                    engine.push_scan(p, normals=nr)
                else:
                    engine.push_scan(loader.get(i))
            engine.flush()
            engine.reset()
            # fresh loader: the prefetch window has been consumed
            loader = FrameLoader(
                [p for _, p in frames],
                cap=cfg.max_points if cfg.host_voxelize else cfg.max_raw_points,
                window=8, threads=4 if cfg.host_voxelize else 2,
                voxel=cfg.voxel_size if cfg.host_voxelize else 0.0,
                raw_cap=cfg.max_raw_points,
                normals_radius=(
                    cfg.effective_normal_radius if cfg.host_normals else 0.0
                ),
            )
            t_warm = time.perf_counter() - t0
            print(f"warmup ({wn} frames, compile/load): {t_warm:.1f}s",
                  file=sys.stderr, flush=True)
        _run_streaming(args, cfg, engine, frames, loader, start_frame, period)
    if args.profile:
        import jax

        jax.profiler.stop_trace()
        print(f"profiler trace -> {args.profile}")
    wall = time.perf_counter() - t_start
    wall -= t_warm  # the untimed --warmup-run pass (0.0 without it)
    sps = (len(frames) - start_frame) / wall

    extra = {"scans_per_sec": sps, "wall_sec": wall}

    gt = None
    gt_path = os.path.join(args.data_dir, "poses_gt.txt")
    if os.path.exists(gt_path):
        from .utils.dataset import load_gt_poses
        from .utils.metrics import ate_rmse, rpe

        gt = load_gt_poses(gt_path)
        traj = engine.trajectory()
        extra["ate_rmse"] = ate_rmse(traj, gt)
        extra["rpe_trans"], extra["rpe_rot"] = rpe(traj, gt)
        print(f"ATE RMSE: {extra['ate_rmse']:.3f} m")
    export.export_all(args.out_dir, engine, extra, gt=gt)
    print(
        f"done: {len(frames)} scans in {wall:.1f}s ({sps:.1f} scans/s), "
        f"loops={int(engine.state.loop_count)} -> {args.out_dir}"
    )
    return 0


def _run_streaming(args, cfg, engine, frames, loader, start_frame, period):
    from .utils import export

    t_push0 = time.perf_counter()
    for i, (_, path) in enumerate(frames):
        if i < start_frame:
            continue
        t0 = time.perf_counter()
        if cfg.host_normals:
            pts_i, nrm_i = loader.get_with_normals(i)
            info = engine.push_scan(pts_i, sync_info=args.verbose, normals=nrm_i)
        else:
            info = engine.push_scan(loader.get(i), sync_info=args.verbose)
        if args.checkpoint_every and i and i % args.checkpoint_every == 0:
            engine.save_checkpoint(
                os.path.join(args.out_dir, "checkpoint.npz")
            )
        if args.export_every and i and i % args.export_every == 0:
            # live observability (slam_node.cpp:154-157 analog); costs device
            # syncs, so the cadence should be coarse
            export.export_snapshot(args.out_dir, engine)
        if info:
            print(f"Loop: {info['query']} <-> {info['matches']}")
        if args.verbose and i % 10 == 0 and i > 0:
            # mirror slam_node.cpp:169-174 cadence (each read syncs the device)
            err = float(engine.state.icp_error[i])
            ms = (time.perf_counter() - t0) * 1e3
            print(
                f"Frame {i}/{len(frames) - 1}: {ms:.1f}ms, err={err:.2e}, "
                f"loops={int(engine.state.loop_count)}"
            )
        if period:
            dt = time.perf_counter() - t0
            if dt < period:
                time.sleep(period - dt)
    engine.flush()
    import numpy as _np

    _np.asarray(engine.state.n_poses)  # sync: split push vs finalize honestly
    t_push = time.perf_counter() - t_push0
    t0 = time.perf_counter()
    engine.finalize()
    _np.asarray(engine.state.n_poses)
    t_fin = time.perf_counter() - t0
    n = len(frames) - start_frame
    print(
        f"streaming: push {t_push:.1f}s ({n / t_push:.1f} scans/s), "
        f"finalize {t_fin:.1f}s"
    )


def _lane_names(dirs: list) -> list:
    """Per-lane export names from sequence directories.

    Duplicate basenames (e.g. the same directory run in two lanes) would
    silently overwrite each other's trajectory file and ATE entry —
    disambiguate them with the lane index."""
    base = [os.path.basename(os.path.normpath(d)) or f"seq{b}"
            for b, d in enumerate(dirs)]
    return [f"lane{b}_{n}" if base.count(n) > 1 else n
            for b, n in enumerate(base)]


def cmd_run_batch(args) -> int:
    """Batched multi-sequence SLAM (BASELINE.md config ladder #4).

    Supports the same fast-path machinery as the single-sequence `run`:
    --mode fast/fidelity presets, host-voxelize prep in loader workers,
    cadence-spanning multi-tick dispatch blocks, --resident preload with
    --warmup-run, and per-lane ATE/metrics export."""
    import json

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from .config import SlamConfig
    from .parallel import BatchedSlamEngine
    from .utils import export
    from .utils.io import discover_frames, load_scan
    from .utils.native import FrameLoader

    dirs = [d for d in args.data_dirs.split(",") if d]
    seqs = [discover_frames(d) for d in dirs]
    if not all(seqs):
        print("empty sequence directory", file=sys.stderr)
        return 1
    n = min(len(s) for s in seqs)
    if args.frames:
        n = min(n, args.frames)

    cfg = _apply_mode(SlamConfig(), args.mode)
    cfg = cfg.replace(
        voxel_size=args.voxel_size,
        max_frames=n + 8,  # right-size DB-linear costs (same as cmd_run)
    )
    if args.max_points:
        cfg = cfg.replace(max_points=args.max_points, lc_cloud_points=0)
    if args.lc_points:
        cfg = cfg.replace(lc_cloud_points=args.lc_points)
    if args.dispatch_block is not None:
        cfg = cfg.replace(dispatch_block=args.dispatch_block)
    if not args.no_host_voxelize:
        cfg = cfg.replace(host_voxelize=True)
    if args.max_raw_points:
        cfg = cfg.replace(max_raw_points=args.max_raw_points)
    else:
        n0 = max(len(load_scan(s[0][1])) for s in seqs)
        cap = 1 << max(int(np.ceil(np.log2(max(n0, 1024)))), 10)
        cfg = cfg.replace(max_raw_points=cap)

    loaders = [
        FrameLoader(
            [p for _, p in seq[:n]],
            cap=cfg.max_points if cfg.host_voxelize else cfg.max_raw_points,
            window=8, threads=2,
            voxel=cfg.voxel_size if cfg.host_voxelize else 0.0,
            raw_cap=cfg.max_raw_points,
        )
        for seq in seqs
    ]
    t_start = time.perf_counter()
    if args.resident:
        t0 = time.perf_counter()
        prepared = [[ld.get(i) for i in range(n)] for ld in loaders]
        t_prep = time.perf_counter() - t0
        print(f"prep: {t_prep:.1f}s", file=sys.stderr, flush=True)
        if not args.max_points:
            # right-size the cloud pad to the prepared maximum (cmd_run's
            # sensor auto-sizing, over all lanes)
            mx = max(max(len(p) for p in lane) for lane in prepared)
            cap = max(4096, 1 << int(np.ceil(np.log2(max(mx, 1)))))
            if cap < cfg.max_points:
                print(f"auto-sized max_points: {cfg.max_points} -> {cap}",
                      file=sys.stderr)
                cfg = cfg.replace(max_points=cap)
        eng = BatchedSlamEngine(
            cfg, batch=len(dirs), optimize_midrun=cfg.optimize_midrun
        )
        t0 = time.perf_counter()
        eng.preload(prepared)
        t_up = time.perf_counter() - t0
        print(f"upload: {t_up:.1f}s", file=sys.stderr, flush=True)
        t_warm = 0.0
        if args.warmup_run:
            t0 = time.perf_counter()
            eng.run_preloaded()
            eng.finalize()
            np.asarray(eng.state.n_poses)
            t_warm = time.perf_counter() - t0
            print(f"warmup run (compile/load + run): {t_warm:.1f}s",
                  file=sys.stderr, flush=True)
            eng.reset()
        t0 = time.perf_counter()
        eng.run_preloaded()
        eng.finalize()
        np.asarray(eng.state.n_poses)  # honest device sync
        t_dev = time.perf_counter() - t0
        print(
            f"resident run: prep {t_prep:.1f}s + upload {t_up:.1f}s + device "
            f"{t_dev:.1f}s ({n * len(dirs) / t_dev:.1f} scans/s aggregate "
            "device-side)"
        )
        resident_split = {
            "prep_sec": t_prep, "upload_sec": t_up, "device_sec": t_dev,
            "scans_per_sec_device_aggregate": n * len(dirs) / t_dev,
        }
    else:
        eng = BatchedSlamEngine(
            cfg, batch=len(dirs), optimize_midrun=cfg.optimize_midrun
        )
        t_warm = 0.0
        resident_split = None
        t0 = time.perf_counter()
        for i in range(n):
            eng.push_scans([ld.get(i) for ld in loaders])
        eng.finalize()
        np.asarray(eng.state.n_poses)
    wall = time.perf_counter() - t_start - t_warm
    os.makedirs(args.out_dir, exist_ok=True)
    trajs = eng.trajectories()
    total = n * len(dirs)
    metrics = {
        "sequences": len(dirs), "frames": n,
        "wall_sec": wall, "scans_per_sec_aggregate": total / wall,
        "scans_per_sec_per_lane": n / wall,
        "loops": np.asarray(eng.state.loop_count).tolist(),
        "mode": args.mode,
    }
    if resident_split is not None:
        metrics["resident"] = resident_split
    from .utils.metrics import ate_rmse

    from .utils.dataset import load_gt_poses

    lane_names = _lane_names(dirs)
    for b, d in enumerate(dirs):
        name = lane_names[b]
        export.save_trajectory_kitti(
            os.path.join(args.out_dir, f"trajectory_{name}.txt"), trajs[b]
        )
        gt_path = os.path.join(d, "poses_gt.txt")
        if os.path.exists(gt_path):
            gt = load_gt_poses(gt_path)
            m = min(len(gt), len(trajs[b]))
            metrics.setdefault("ate_rmse", {})[name] = float(
                ate_rmse(trajs[b][:m], gt[:m])
            )
    with open(os.path.join(args.out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    if "ate_rmse" in metrics:
        print("ATE RMSE: " + ", ".join(
            f"{k}={v:.3f} m" for k, v in metrics["ate_rmse"].items()
        ))
    print(
        f"done: {len(dirs)} sequences x {n} frames in {wall:.1f}s "
        f"({total / wall:.1f} scans/s aggregate, "
        f"{n / wall:.1f}/lane) -> {args.out_dir}"
    )
    return 0


def cmd_convert(args) -> int:
    from .utils.io import convert_bin_to_ply, convert_directory

    if args.directory:
        n = convert_directory(args.input, args.output)
        print(f"Converted {n} files -> {args.output}")
    else:
        n = convert_bin_to_ply(args.input, args.output)
        print(f"Converted: {args.input} -> {args.output} ({n} points)")
    return 0


def cmd_make_dataset(args) -> int:
    from .utils.dataset import make_dataset

    make_dataset(
        args.out, n_frames=args.frames, seed=args.seed,
        max_points=args.scan_points, fmt=args.format,
    )
    print(f"Wrote {args.frames} frames + poses_gt.txt -> {args.out}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="lidar_slam_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="run SLAM over a frame directory")
    r.add_argument("--data-dir", required=True)
    r.add_argument("--out-dir", default="slam_out")
    r.add_argument("--voxel-size", type=float, default=0.5)
    r.add_argument("--playback-rate", type=float, default=0.0,
                   help="Hz throttle; 0 = as fast as possible")
    r.add_argument("--max-iterations", type=int, default=None,
                   help="ICP iteration budget (default: mode's)")
    r.add_argument("--tolerance", type=float, default=None,
                   help="ICP |delta-error| tolerance (default: mode's)")
    r.add_argument(
        "--mode", choices=["default", "fast", "fidelity"], default="default",
        help="fast = the benchmarked throughput configuration (PERF.md: "
        "warm-started subsampled ICP, slab_pallas 1-NN, dispatch blocks, "
        "deferred optimization); fidelity = reference-exact runtime "
        "settings (50 iters, tol 1e-6, identity init, full density, exact "
        "1-NN, optimize-on-find). Explicit flags override the mode.",
    )
    r.add_argument("--grid-resolution", type=float, default=0.2)
    r.add_argument("--height-min", type=float, default=0.3)
    r.add_argument("--height-max", type=float, default=2.0)
    r.add_argument("--max-range", type=float, default=40.0)
    r.add_argument("--frames", type=int, default=0, help="limit frame count")
    r.add_argument("--max-points", type=int, default=0)
    r.add_argument("--lc-points", type=int, default=0,
                   help="loop-closure DB cloud size (0 = same as max-points)")
    r.add_argument("--max-raw-points", type=int, default=0)
    r.add_argument("--max-frames", type=int, default=0)
    r.add_argument(
        "--knn-backend",
        choices=["auto", "pallas", "xla", "slab", "grid", "slab_pallas"],
        default="",
        help="1-NN search backend (auto = exact brute force: pallas on TPU, "
        "xla elsewhere; slab/grid/slab_pallas are faster pruned searches — "
        "slab_pallas is the benchmarked fused kernel, exact under the "
        "warm-start motion bound; see PERF.md)",
    )
    r.add_argument("--preset", choices=["default", "tiny"], default="default")
    r.add_argument("--dispatch-block", type=int, default=None,
                   help="scans per device dispatch (amortizes the ~2.5-6 ms "
                   "per-dispatch cost; 0/1 = one dispatch per scan)")
    r.add_argument("--icp-sample", type=int, default=None,
                   help="ICP source subsample (0 = register every point)")
    r.add_argument("--warm-start", action="store_true",
                   help="seed ICP with the previous accepted delta "
                   "(constant-velocity model) instead of identity")
    r.add_argument("--normal-method",
                   choices=["adaptive", "radius", "knn"], default="",
                   help="normal estimator (see SlamConfig.normal_method)")
    r.add_argument("--probe-stride", type=int, default=0,
                   help="adaptive-normals count-probe stride (>1 replicates "
                   "the smooth radius field; moment PCA stays per-point)")
    r.add_argument("--normal-stride", type=int, default=0,
                   help=">1: normals on every Nth sorted point, replicated")
    r.add_argument("--no-midrun-optimize", action="store_true",
                   help="defer ALL pose-graph optimization to finalize "
                   "(detection- and final-ATE-exact; saves a bounded LM "
                   "chunk per firing tick — see SlamConfig.optimize_midrun)")
    r.add_argument("--resident", action="store_true",
                   help="upload the whole (prepared) dataset to the device "
                   "once and run with scalar-only dispatches (the "
                   "benchmarked steady state; needs the dataset to fit HBM)")
    r.add_argument("--warmup-run", action="store_true",
                   help="run untimed first to absorb the per-process program "
                   "compile/load cost (bench.py methodology): the whole "
                   "dataset with --resident, or just enough frames to "
                   "compile every steady-state program when streaming")
    r.add_argument("--cpu", action="store_true", help="force the CPU backend")
    r.add_argument("--no-host-voxelize", action="store_true",
                   help="voxelize on device instead of in the loader workers")
    r.add_argument("--verbose", action="store_true",
                   help="per-frame stats + loop prints (forces device syncs)")
    r.add_argument("--checkpoint-every", type=int, default=0,
                   help="save out_dir/checkpoint.npz every N frames")
    r.add_argument("--export-every", type=int, default=0,
                   help="dump trajectory/map/occupancy/metrics snapshots "
                   "every N frames (live observability; costs syncs)")
    r.add_argument("--resume", default="",
                   help="resume from a checkpoint.npz (same config required)")
    r.add_argument("--profile", default="",
                   help="write a jax.profiler trace to this directory")
    r.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (slow; for numeric debugging)")
    r.set_defaults(fn=cmd_run)

    b = sub.add_parser(
        "run-batch", help="run K sequences concurrently (vmap, one program)"
    )
    b.add_argument("--data-dirs", required=True,
                   help="comma-separated frame directories")
    b.add_argument("--out-dir", default="slam_batch_out")
    b.add_argument("--voxel-size", type=float, default=0.5)
    b.add_argument("--max-points", type=int, default=0,
                   help="cloud pad (0 = auto-size from the data with "
                   "--resident, else the config default)")
    b.add_argument("--lc-points", type=int, default=0,
                   help="loop-closure DB cloud size (0 = same as max-points)")
    b.add_argument("--max-raw-points", type=int, default=0,
                   help="raw scan pad (0 = auto-size from the first frames)")
    b.add_argument("--frames", type=int, default=0)
    b.add_argument(
        "--mode", choices=["default", "fast", "fidelity"], default="default",
        help="same presets as `run` (fast = benchmarked throughput config: "
        "warm-started subsampled ICP, slab_pallas 1-NN, cadence-spanning "
        "multi-tick blocks, deferred optimization)",
    )
    b.add_argument("--dispatch-block", type=int, default=None,
                   help="scans per device dispatch per lane (may span "
                   "several loop cadences — the covered queries run bunched "
                   "in one vmapped multi-tick dispatch, detection-exact)")
    b.add_argument("--resident", action="store_true",
                   help="upload every lane's prepared dataset to the device "
                   "once and run with scalar-only dispatches")
    b.add_argument("--warmup-run", action="store_true",
                   help="(with --resident) one untimed pass first to absorb "
                   "compile/load cost (bench.py methodology)")
    b.add_argument("--no-host-voxelize", action="store_true",
                   help="voxelize on device instead of in the loader workers")
    b.add_argument("--cpu", action="store_true",
                   help="force the CPU backend")
    b.set_defaults(fn=cmd_run_batch)

    c = sub.add_parser("convert", help="KITTI .bin -> .ply")
    c.add_argument("input")
    c.add_argument("output")
    c.add_argument("-d", "--directory", action="store_true")
    c.set_defaults(fn=cmd_convert)

    m = sub.add_parser("make-dataset", help="generate synthetic loop dataset")
    m.add_argument("--out", required=True)
    m.add_argument("--frames", type=int, default=120)
    m.add_argument("--seed", type=int, default=0)
    m.add_argument("--scan-points", type=int, default=20000)
    m.add_argument("--format", choices=["ply", "bin"], default="ply")
    m.set_defaults(fn=cmd_make_dataset)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
