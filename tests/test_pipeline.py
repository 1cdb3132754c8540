"""End-to-end pipeline tests on a small in-memory synthetic sequence."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from lidar_slam_tpu.config import tiny_config
from lidar_slam_tpu.models.pipeline import SlamEngine, init_state, make_init_fn, make_step_fn
from lidar_slam_tpu.utils.dataset import (
    generate_trajectory,
    generate_world,
    render_scan,
    route_half_for,
)
from lidar_slam_tpu.utils.metrics import ate_rmse, rpe


@pytest.fixture(scope="module")
def small_run():
    """24-frame odometry-only segment (no loop)."""
    n = 24
    half = route_half_for(60)  # gentle curvature
    world = generate_world(0, route_half=half)
    gt = generate_trajectory(60, half=half)[:n]
    rng = np.random.default_rng(0)
    scans = [render_scan(world, gt[i], rng, max_range=30.0, max_points=4000)
             for i in range(n)]
    # voxel_size matched to the test scan density (~0.7 m spacing) so the
    # radius-normal neighborhood (2.4 * voxel) finds enough neighbors
    cfg = tiny_config(max_raw_points=4096, max_points=4096, lc_cloud_points=1024,
                      max_frames=32).replace(voxel_size=0.8)
    eng = SlamEngine(cfg)
    for s in scans:
        eng.push_scan(s)
    return eng, gt


def test_odometry_tracks_ground_truth(small_run):
    eng, gt = small_run
    traj = eng.trajectory()
    assert traj.shape == (24, 4, 4)
    ate = ate_rmse(traj, gt)
    assert ate < 1.0, ate
    t_err, r_err = rpe(traj, gt)
    assert t_err < 0.2, t_err
    assert r_err < 0.05, r_err


def test_metrics_recorded(small_run):
    eng, _ = small_run
    m = eng.metrics()
    assert len(m["icp_error"]) == 24
    assert m["icp_converged"][1:].mean() > 0.8
    assert (m["frame_npts"][1:] > 100).all()


def test_occupancy_and_map(small_run):
    eng, _ = small_run
    grid = eng.occupancy()
    assert grid.sum() > 50  # occupied cells exist
    mp = eng.global_map()
    assert mp.shape[0] > 5000
    assert np.isfinite(mp).all()


def test_frame_skip_path():
    """A scan below min_points copies the pose and adds no factor
    (slam_node.cpp:125-130)."""
    cfg = tiny_config(max_raw_points=2048, max_points=512, min_points=50,
                      max_frames=16)
    eng = SlamEngine(cfg)
    rng = np.random.default_rng(1)
    full = rng.normal(size=(800, 3)).astype(np.float32) * 10
    eng.push_scan(full)
    eng.push_scan(full + 0.1)
    eng.push_scan(full[:5])  # frame 2: skipped
    assert not bool(eng.state.pg.odom_valid[2])
    np.testing.assert_allclose(
        np.asarray(eng.state.poses[2]), np.asarray(eng.state.poses[1]), atol=1e-6
    )
    assert not bool(eng.state.db.in_db[2])
    # pipeline continues cleanly after the gap (the reference would crash in
    # GTSAM here — missing initial estimate)
    eng.push_scan(full + 0.2)
    assert bool(eng.state.pg.odom_valid[3])


def test_divergence_fallback():
    """Non-overlapping clouds -> identity delta but factor recorded with the
    real fitness (slam_node.cpp:139-145)."""
    cfg = tiny_config(max_raw_points=1024, max_points=256, min_points=8,
                      max_frames=8)
    eng = SlamEngine(cfg)
    rng = np.random.default_rng(2)
    a = rng.normal(size=(300, 3)).astype(np.float32) * 5
    # disjoint but within the voxel-key packing range (+-255 m at 0.5 m voxel)
    b = rng.normal(size=(300, 3)).astype(np.float32) * 5 + 150.0
    eng.push_scan(a)
    eng.push_scan(b)
    np.testing.assert_allclose(
        np.asarray(eng.state.poses[1]), np.eye(4), atol=1e-5
    )
    assert bool(eng.state.pg.odom_valid[1])
    assert float(eng.state.icp_error[1]) > 1.0


def test_init_state_shapes():
    cfg = tiny_config()
    st = init_state(cfg)
    assert st.poses.shape == (cfg.max_frames, 4, 4)
    assert st.db.clouds.shape == (cfg.max_frames, cfg.lc_points, 3)
    assert int(st.n_poses) == 1


def test_global_map_subsampled(small_run):
    eng, _ = small_run
    full = eng.global_map()
    sub = eng.global_map(max_points_per_frame=64)
    assert 0 < sub.shape[0] <= 24 * 64
    assert sub.shape[0] < full.shape[0]
    assert np.isfinite(sub).all()


def test_export_snapshot_midrun(tmp_path):
    """--export-every analog: a snapshot taken mid-run (before finalize)
    leaves usable artifacts (slam_node.cpp:154-157 live publishing)."""
    from lidar_slam_tpu.utils import export

    cfg = tiny_config(max_raw_points=2048, max_points=512, min_points=8,
                      max_frames=16)
    eng = SlamEngine(cfg)
    rng = np.random.default_rng(3)
    full = rng.normal(size=(800, 3)).astype(np.float32) * 10
    for i in range(4):
        eng.push_scan(full + 0.05 * i)
    out = str(tmp_path / "snap")
    export.export_snapshot(out, eng, map_points_per_frame=64)
    import os

    traj = np.loadtxt(os.path.join(out, "trajectory.txt"))
    assert traj.shape == (4, 12)
    assert os.path.exists(os.path.join(out, "map.ply"))
    assert os.path.exists(os.path.join(out, "occupancy.npz"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))


def test_grid_backend_pipeline():
    """knn_backend='grid' (sorted-cell pruned search) runs end-to-end and
    tracks ground truth on the structured synthetic world (grid pruning is
    exact only when NN distances stay under the cell size, so it needs
    scan-density clouds, not sparse random blobs)."""
    n = 8
    half = route_half_for(60)
    world = generate_world(0, route_half=half)
    gt = generate_trajectory(60, half=half)[:n]
    rng = np.random.default_rng(4)
    scans = [render_scan(world, gt[i], rng, max_range=30.0, max_points=4000)
             for i in range(n)]
    cfg = tiny_config(max_raw_points=4096, max_points=4096,
                      lc_cloud_points=1024, max_frames=16).replace(
        voxel_size=0.8, knn_backend="grid")
    eng = SlamEngine(cfg)
    for s in scans:
        eng.push_scan(s)
    ate = ate_rmse(eng.trajectory(), gt)
    assert ate < 1.0, ate


def test_block_dispatch_equivalence():
    """dispatch_block>1 (lax.scan over the step body + deferred loop cadence)
    is bit-exact vs per-scan stepping, including finalize and metrics."""
    n = 24
    half = route_half_for(n)
    world = generate_world(0, route_half=half)
    gt = generate_trajectory(n, half=half)
    rng = np.random.default_rng(0)
    scans = [render_scan(world, gt[i], rng, max_points=1500) for i in range(n)]

    e1 = SlamEngine(tiny_config())
    e2 = SlamEngine(tiny_config(dispatch_block=2))
    for s in scans:
        e1.push_scan(s)
        e2.push_scan(s)
    e1.finalize()
    e2.finalize()
    assert np.abs(e1.trajectory() - e2.trajectory()).max() < 1e-6
    m1, m2 = e1.metrics(), e2.metrics()
    assert m1["loop_count"] == m2["loop_count"]
    np.testing.assert_array_equal(m1["icp_iters"], m2["icp_iters"])


def test_multi_tick_block_equivalence():
    """dispatch_block SPANNING several cadence periods (bunched multi-tick
    detection) finds the IDENTICAL loop set as per-cadence ticking: the
    detect candidate mask is one-sided in frame index and verification ICP
    reads only stored clouds, so a query bunched after the block returns
    exactly what it would have at its own tick. Trajectories agree to
    optimizer noise (inline-optimize timing shifts; finalize re-polishes
    from the same factors)."""
    # straight run + revisit of the start (the proven loop-closure scene
    # from test_loop_closure.make_scene_scans, engine-sized)
    world = generate_world(0, route_half=8.0)
    poses = []
    for i in range(10):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [i * 1.5, 0, 1.8]
        poses.append(T)
    for k in range(4):  # frames 10..13 re-drive poses 1..4 (with a yaw)
        T = np.eye(4, dtype=np.float32)
        c, s = np.cos(0.2), np.sin(0.2)
        T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        T[:3, 3] = poses[1 + k][:3, 3]
        poses.append(T)
    rng = np.random.default_rng(0)
    scans = [
        render_scan(world, p, rng, max_range=25.0, max_points=2000)
        for p in poses
    ]
    # thresholds scaled for sparse test scans (see test_loop_closure);
    # 2048-pt clouds — at tiny's 512 the SC descriptors are too noisy for
    # any sane threshold (best true-match distance 0.47)
    lc_cfg = dict(frame_gap=4, sc_distance_threshold=0.5,
                  icp_fitness_threshold=0.6, icp_max_iterations=15,
                  verify_tolerance=1e-3)

    def cfg(block):
        c = tiny_config(dispatch_block=block, max_raw_points=4096,
                        max_points=2048, lc_cloud_points=2048)
        return c.replace(lc=dataclasses.replace(c.lc, **lc_cfg))

    e1 = SlamEngine(cfg(2))       # block == cadence
    e2 = SlamEngine(cfg(4))       # 2 ticks per block
    assert e2._n_ticks == 2 and e2._multi_tick_fn is not None
    for s in scans:
        e1.push_scan(s)
        e2.push_scan(s)
    e1.finalize()
    e2.finalize()
    m1, m2 = e1.metrics(), e2.metrics()
    assert m1["loop_count"] == m2["loop_count"]
    assert m1["loop_count"] > 0  # the route must actually close loops
    # identical factor sets, in the same acceptance order
    np.testing.assert_array_equal(
        np.asarray(e1.state.pg.loop_from), np.asarray(e2.state.pg.loop_from)
    )
    np.testing.assert_array_equal(
        np.asarray(e1.state.pg.loop_to), np.asarray(e2.state.pg.loop_to)
    )
    np.testing.assert_array_equal(m1["icp_iters"], m2["icp_iters"])
    assert np.abs(e1.trajectory() - e2.trajectory()).max() < 5e-2


def test_resident_mode_equivalence():
    """preload + run_preloaded (device-resident scans, scalar-only dispatch
    operands) is bit-exact vs streaming push_scan, and reset() reruns from a
    blank state without rebuilding the jitted programs."""
    n = 24
    half = route_half_for(n)
    world = generate_world(0, route_half=half)
    gt = generate_trajectory(n, half=half)
    rng = np.random.default_rng(0)
    scans = [render_scan(world, gt[i], rng, max_points=1500) for i in range(n)]

    e1 = SlamEngine(tiny_config(dispatch_block=2))
    for s in scans:
        e1.push_scan(s)
    e1.finalize()

    e2 = SlamEngine(tiny_config(dispatch_block=2))
    e2.preload(scans)
    e2.run_preloaded()
    e2.finalize()
    assert np.abs(e1.trajectory() - e2.trajectory()).max() < 1e-6
    m1, m2 = e1.metrics(), e2.metrics()
    assert m1["loop_count"] == m2["loop_count"]
    np.testing.assert_array_equal(m1["icp_iters"], m2["icp_iters"])

    # reset + rerun reproduces the same result on the same resident data
    e2.reset()
    e2.run_preloaded()
    e2.finalize()
    assert np.abs(e1.trajectory() - e2.trajectory()).max() < 1e-6

    # partial tail: resident length not a block multiple
    e3 = SlamEngine(tiny_config(dispatch_block=2, loop_check_every=4))
    e3.preload(scans[:11])
    e3.run_preloaded()
    assert int(e3.state.n_poses) == 11


def test_resident_resume_offset(tmp_path):
    """Resuming a checkpointed run with a TAIL-ONLY preload: store row i is
    dataset frame frame0+i (preload(frame0=...)), so block slicing must use
    ROW indices while step/tick frame numbers stay absolute. Regression for
    an off-by-start_frame bug where run_preloaded indexed rows by absolute
    frame number."""
    n, k = 24, 9  # resume point NOT a block multiple: exercises the
    half = route_half_for(n)  # per-step tail path before the first block
    world = generate_world(0, route_half=half)
    gt = generate_trajectory(n, half=half)
    rng = np.random.default_rng(0)
    scans = [render_scan(world, gt[i], rng, max_points=1500) for i in range(n)]
    cfg = tiny_config(dispatch_block=2)

    e1 = SlamEngine(cfg)
    for s in scans:
        e1.push_scan(s)
    e1.finalize()

    e2 = SlamEngine(cfg)
    for s in scans[:k]:
        e2.push_scan(s)
    e2.flush()
    ckpt = str(tmp_path / "state.npz")
    e2.save_checkpoint(ckpt)

    e3 = SlamEngine(cfg)
    e3.load_checkpoint(ckpt)
    e3.preload(scans[k:], frame0=k)
    e3.run_preloaded()
    e3.finalize()
    assert int(e3.state.n_poses) == n
    assert np.abs(e1.trajectory() - e3.trajectory()).max() < 1e-6
    m1, m3 = e1.metrics(), e3.metrics()
    assert m1["loop_count"] == m3["loop_count"]


def test_block_dispatch_partial_tail_flush():
    """A dataset length that is not a block multiple still processes every
    frame (flush dispatches the partial tail as single steps)."""
    n = 11  # blocks of 4 -> tail of 2 after frame 0
    half = route_half_for(n)
    world = generate_world(0, route_half=half)
    gt = generate_trajectory(n, half=half)
    rng = np.random.default_rng(1)
    scans = [render_scan(world, gt[i], rng, max_points=1500) for i in range(n)]
    cfg = tiny_config(dispatch_block=2, loop_check_every=4)
    eng = SlamEngine(cfg)
    for s in scans:
        eng.push_scan(s)
    traj = eng.trajectory()  # flush()es internally
    assert traj.shape[0] == n
    assert int(eng.state.n_poses) == n


def test_warm_start_tracks_rotation():
    """Constant-velocity ICP warm start (prev_delta seed) converges in fewer
    iterations than identity init on a steadily turning route."""
    n = 10
    half = route_half_for(60)
    world = generate_world(0, route_half=half)
    gt = generate_trajectory(60, half=half)[:n]
    rng = np.random.default_rng(2)
    scans = [render_scan(world, gt[i], rng, max_points=3000) for i in range(n)]
    base = tiny_config(max_raw_points=4096, max_points=4096,
                       lc_cloud_points=1024, max_frames=16)
    cold = SlamEngine(base)
    warm = SlamEngine(base.replace(icp=base.icp.__class__(
        max_iterations=base.icp.max_iterations, tolerance=base.icp.tolerance,
        normal_k=base.icp.normal_k, warm_start=True)))
    for s in scans:
        cold.push_scan(s)
        warm.push_scan(s)
    ate_c = ate_rmse(cold.trajectory(), gt)
    ate_w = ate_rmse(warm.trajectory(), gt)
    it_c = cold.metrics()["icp_iters"][1:].mean()
    it_w = warm.metrics()["icp_iters"][1:].mean()
    assert ate_w < max(2.0 * ate_c, 0.5), (ate_w, ate_c)
    assert it_w <= it_c + 0.5, (it_w, it_c)


def test_deferred_optimize_equivalence():
    """optimize_midrun=False (defer ALL pose-graph optimization to finalize)
    accepts the IDENTICAL loop factor set and lands on the same final
    trajectory: detection reads only stored clouds + frame indices (never
    poses), and finalize optimizes the same factor graph to convergence —
    mid-run optimize only changes the warm start finalize converges from."""
    world = generate_world(0, route_half=8.0)
    poses = []
    for i in range(10):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [i * 1.5, 0, 1.8]
        poses.append(T)
    for k in range(4):
        T = np.eye(4, dtype=np.float32)
        c, s = np.cos(0.2), np.sin(0.2)
        T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        T[:3, 3] = poses[1 + k][:3, 3]
        poses.append(T)
    rng = np.random.default_rng(0)
    scans = [
        render_scan(world, p, rng, max_range=25.0, max_points=2000)
        for p in poses
    ]
    lc_cfg = dict(frame_gap=4, sc_distance_threshold=0.5,
                  icp_fitness_threshold=0.6, icp_max_iterations=15,
                  verify_tolerance=1e-3)

    def cfg(midrun):
        c = tiny_config(dispatch_block=4, max_raw_points=4096,
                        max_points=2048, lc_cloud_points=2048,
                        optimize_midrun=midrun)
        return c.replace(lc=dataclasses.replace(c.lc, **lc_cfg))

    e_on = SlamEngine(cfg(True))
    e_off = SlamEngine(cfg(False))
    for s in scans:
        e_on.push_scan(s)
        e_off.push_scan(s)
    e_on.finalize()
    e_off.finalize()
    m_on, m_off = e_on.metrics(), e_off.metrics()
    assert m_on["loop_count"] == m_off["loop_count"]
    assert m_on["loop_count"] > 0
    np.testing.assert_array_equal(
        np.asarray(e_on.state.pg.loop_from), np.asarray(e_off.state.pg.loop_from)
    )
    np.testing.assert_array_equal(
        np.asarray(e_on.state.pg.loop_to), np.asarray(e_off.state.pg.loop_to)
    )
    # odometry deltas untouched by optimization timing
    np.testing.assert_array_equal(m_on["icp_iters"], m_off["icp_iters"])
    assert np.abs(e_on.trajectory() - e_off.trajectory()).max() < 5e-2


def test_occ_dropped_fires_when_route_exceeds_grid():
    """VERDICT r3 item 7 (closing r2 item 2): the reference's cell store is
    an UNBOUNDED hash set (slam_node.hpp:45-59); our dense grid must COUNT
    what it cannot store, at the engine level. Drive a route whose estimated
    trajectory (and world points in sensor range) leave the tiny test grid
    (+-25.6 m) and assert the accumulated counter fires."""
    rng = np.random.default_rng(3)
    world = np.stack(
        [rng.uniform(-5.0, 45.0, 4000), rng.uniform(-10.0, 10.0, 4000),
         rng.uniform(0.4, 1.9, 4000)], 1,
    ).astype(np.float32)
    cfg = tiny_config(
        max_raw_points=4096, max_points=4096, lc_cloud_points=1024,
        max_frames=72, loop_check_every=10**9,
    ).replace(voxel_size=0.8)
    assert cfg.grid.grid_dim * cfg.grid.resolution / 2 < 45.0
    eng = SlamEngine(cfg)
    for i in range(60):  # sensor drives to x = 35.4 m > the 25.6 m half-grid
        eng.push_scan(world - np.array([i * 0.6, 0.0, 0.0], np.float32))
    assert eng.metrics()["occ_dropped"] > 0


def test_occ_dropped_zero_when_route_fits():
    """Companion shape check: when the grid covers route + sensor range the
    counter stays zero (the bench asserts the same at full scale via its
    summary line, on the 8192-cell default that covers +-819 m)."""
    rng = np.random.default_rng(3)
    world = np.stack(
        [rng.uniform(-5.0, 45.0, 4000), rng.uniform(-10.0, 10.0, 4000),
         rng.uniform(0.4, 1.9, 4000)], 1,
    ).astype(np.float32)
    cfg = tiny_config(
        max_raw_points=4096, max_points=4096, lc_cloud_points=1024,
        max_frames=16, loop_check_every=10**9,
    ).replace(voxel_size=0.8)
    cfg = cfg.replace(grid=dataclasses.replace(cfg.grid, grid_dim=1024))
    assert cfg.grid.grid_dim * cfg.grid.resolution / 2 > 45.0 + 6.0
    eng = SlamEngine(cfg)
    for i in range(10):
        eng.push_scan(world - np.array([i * 0.6, 0.0, 0.0], np.float32))
    assert eng.metrics()["occ_dropped"] == 0
