import jax.numpy as jnp
import numpy as np

from lidar_slam_tpu.config import LoopClosureConfig, ScanContextConfig
from lidar_slam_tpu.models import loop_closure as lc
from lidar_slam_tpu.ops import se3
from lidar_slam_tpu.types import PointCloud
from lidar_slam_tpu.utils.dataset import generate_world, render_scan


def make_scene_scans(rng):
    """Scans at poses 0..n from a synthetic world; last pose revisits pose 1."""
    world = generate_world(0, route_half=8.0)
    poses = []
    for i in range(10):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [i * 1.5, 0, 1.8]
        poses.append(T)
    # pose 10 revisits pose 1's location (with a yaw)
    T = np.eye(4, dtype=np.float32)
    c, s = np.cos(0.2), np.sin(0.2)
    T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    T[:3, 3] = poses[1][:3, 3]
    poses.append(T)
    scans = [
        render_scan(world, p, rng, max_range=25.0, max_points=2000) for p in poses
    ]
    return poses, scans


def to_pc(scan, cap=2048):
    return PointCloud.from_numpy(scan, cap)


def test_detect_finds_revisit(rng):
    poses, scans = make_scene_scans(rng)
    sc_cfg = ScanContextConfig()
    # thresholds scaled for sparse 2000-pt test scans: plane-RMS fitness on
    # sparse clouds sits ~0.4 even for perfect alignment (KITTI-density scans
    # reach the reference's 0.3 threshold; see test_pipeline loop test)
    cfg = LoopClosureConfig(frame_gap=5, sc_distance_threshold=0.35,
                            icp_fitness_threshold=0.6, icp_max_iterations=15)
    db = lc.init_db(16, 2048, sc_cfg)
    for f, scan in enumerate(scans):
        db = lc.add_frame(db, to_pc(scan), jnp.int32(f), sc_cfg)
    det = lc.detect(db, cfg, sc_cfg)
    acc = np.asarray(det.accepted)
    assert acc.any(), (np.asarray(det.sc_distance), np.asarray(det.icp_fitness))
    best = np.argmax(acc)
    match = int(det.match_frame[best])
    assert match in (0, 1, 2), match
    # transform maps query frame into match frame: compare to gt relative pose
    T_true = np.linalg.inv(poses[match]) @ poses[10]
    T_est = np.asarray(det.transform[best])
    err = np.asarray(se3.log(jnp.asarray(T_est @ np.linalg.inv(T_true), jnp.float32)))
    assert np.abs(err[:3]).max() < 0.05, err
    assert np.abs(err[3:]).max() < 0.5, err


def test_frame_gap_blocks_neighbors(rng):
    poses, scans = make_scene_scans(rng)
    sc_cfg = ScanContextConfig()
    cfg = LoopClosureConfig(frame_gap=50)  # larger than the whole run
    db = lc.init_db(16, 2048, sc_cfg)
    for f, scan in enumerate(scans):
        db = lc.add_frame(db, to_pc(scan), jnp.int32(f), sc_cfg)
    det = lc.detect(db, cfg, sc_cfg)
    assert not np.asarray(det.accepted).any()


def test_empty_db_no_detection():
    sc_cfg = ScanContextConfig()
    db = lc.init_db(8, 128, sc_cfg)
    det = lc.detect(db, LoopClosureConfig(), sc_cfg)
    assert not np.asarray(det.accepted).any()


def test_skipped_frames_not_added(rng):
    sc_cfg = ScanContextConfig()
    db = lc.init_db(8, 128, sc_cfg)
    pc = to_pc(rng.normal(size=(100, 3)).astype(np.float32) * 10, 128)
    db = lc.add_frame(db, pc, jnp.int32(3), sc_cfg, enabled=False)
    assert not bool(db.in_db[3])
    assert int(db.last_frame) == -1
    db = lc.add_frame(db, pc, jnp.int32(4), sc_cfg, enabled=True)
    assert bool(db.in_db[4])
    assert int(db.last_frame) == 4


def test_subsample_strided(rng):
    pts = np.zeros((128, 3), np.float32)
    pts[:100] = rng.normal(size=(100, 3))
    mask = np.zeros(128, bool)
    mask[:100] = True
    pc = PointCloud(jnp.asarray(pts), jnp.asarray(mask))
    out = lc.subsample(pc, 32)
    assert out.points.shape == (32, 3)
    assert int(out.count()) == 32
    # strided over the valid prefix, not a prefix slice
    idx0 = np.asarray(out.points[0])
    np.testing.assert_allclose(idx0, pts[0])
    assert not np.allclose(np.asarray(out.points[31]), pts[31])


def test_yaw_seed_improves_rotated_revisit(rng):
    """A revisit with a large yaw: identity-init verification struggles, the
    SC-best-shift yaw seed (improvement over the reference, quirk #8)
    recovers the transform."""
    world = generate_world(3, route_half=8.0)
    base = np.eye(4, dtype=np.float32)
    base[:3, 3] = [4.0, 2.0, 1.8]
    # revisit same place rotated by 100 degrees
    yaw = np.deg2rad(100.0)
    c, s = np.cos(yaw), np.sin(yaw)
    revisit = base.copy()
    revisit[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)

    scans = [
        render_scan(world, base, rng, max_range=25.0, max_points=3000)
    ]
    # spacer frames far away (keep the DB populated without matches)
    for i in range(6):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [40.0 + 3 * i, 40.0, 1.8]
        scans.append(render_scan(world, T, rng, max_range=25.0, max_points=3000))
    scans.append(render_scan(world, revisit, rng, max_range=25.0, max_points=3000))

    sc_cfg = ScanContextConfig()

    def run(yaw_seed):
        cfg = LoopClosureConfig(
            frame_gap=5, sc_distance_threshold=0.5,
            icp_fitness_threshold=0.7, icp_max_iterations=25,
            yaw_seed=yaw_seed,
        )
        db = lc.init_db(16, 4096, sc_cfg)
        for f, scan in enumerate(scans):
            db = lc.add_frame(db, to_pc(scan, 4096), jnp.int32(f), sc_cfg)
        return lc.detect(db, cfg, sc_cfg)

    det_seed = run(True)
    acc = np.asarray(det_seed.accepted)
    assert acc.any(), (
        np.asarray(det_seed.sc_distance), np.asarray(det_seed.icp_fitness)
    )
    best = int(np.argmax(acc))
    assert int(det_seed.match_frame[best]) == 0
    # the recovered transform must encode ~the applied yaw
    from lidar_slam_tpu.ops import se3 as _se3

    T_true = np.linalg.inv(base) @ revisit
    err = np.asarray(
        _se3.log(jnp.asarray(np.asarray(det_seed.transform[best]) @
                             np.linalg.inv(T_true), jnp.float32))
    )
    assert np.abs(err[2]) < 0.15, err  # yaw recovered


def test_stale_query_rejected(rng):
    """expect_query guards the skipped-frame case: a detection pass whose
    expected query was never added to the DB must accept nothing (the
    reference returns early on skipped frames, slam_node.cpp:125-130)."""
    poses, scans = make_scene_scans(rng)
    sc_cfg = ScanContextConfig()
    cfg = LoopClosureConfig(frame_gap=5, sc_distance_threshold=0.35,
                            icp_fitness_threshold=0.6, icp_max_iterations=15)
    db = lc.init_db(16, 2048, sc_cfg)
    for f, scan in enumerate(scans):
        db = lc.add_frame(db, to_pc(scan), jnp.int32(f), sc_cfg)
    # fresh query (frame 10) detects the revisit...
    det = lc.detect(db, cfg, sc_cfg, expect_query=jnp.int32(10))
    assert np.asarray(det.accepted).any()
    # ...but a pass expecting frame 11 (skipped, never added) must not re-find
    # frame 10's loops
    det_stale = lc.detect(db, cfg, sc_cfg, expect_query=jnp.int32(11))
    assert not np.asarray(det_stale.accepted).any()


def test_verify_until_accepted_second_tranche(rng):
    """When the SC-best candidate fails ICP verification, the reference walks
    on to the next candidates (loop_closure.hpp:96-123). With
    max_candidates=1 the second tranche must recover the true loop hiding at
    rank 2; with verify_extra_tranches=0 (round-1 behavior) it is lost."""
    world = generate_world(0, route_half=8.0)
    base = np.eye(4, dtype=np.float32)
    base[:3, 3] = [2.0, 1.0, 1.8]
    query_scan = render_scan(world, base, rng, max_range=25.0, max_points=2000)
    true_match = render_scan(world, base, rng, max_range=25.0, max_points=2000)

    # Decoy: identical Scan Context (per-bin max-z points kept) but destroyed
    # surface structure (every non-max point dropped far below) -> SC distance
    # ~0 yet ICP cannot fit planes to it.
    decoy = query_scan.copy()
    r = np.sqrt(decoy[:, 0] ** 2 + decoy[:, 1] ** 2)
    ang = np.arctan2(decoy[:, 1], decoy[:, 0]) + np.pi
    ring = np.clip((r / 4.0).astype(int), 0, 19)
    sect = np.clip((ang / (2 * np.pi / 60)).astype(int), 0, 59)
    bin_id = ring * 60 + sect
    is_max = np.zeros(len(decoy), bool)
    for b in np.unique(bin_id):
        sel = np.where(bin_id == b)[0]
        is_max[sel[np.argmax(decoy[sel, 2])]] = True
    jitter = rng.uniform(-3.0, 0.0, size=len(decoy)).astype(np.float32)
    decoy[~is_max, 2] += jitter[~is_max]  # lower z never changes the bin max
    decoy[~is_max, :2] += rng.normal(
        scale=0.6, size=(int((~is_max).sum()), 2)
    ).astype(np.float32)

    sc_cfg = ScanContextConfig()
    db = lc.init_db(16, 2048, sc_cfg)
    db = lc.add_frame(db, to_pc(decoy), jnp.int32(0), sc_cfg)
    db = lc.add_frame(db, to_pc(true_match), jnp.int32(1), sc_cfg)
    # spacers so the query respects frame_gap
    far = np.eye(4, dtype=np.float32)
    far[:3, 3] = [60.0, 60.0, 1.8]
    spacer = render_scan(world, far, rng, max_range=25.0, max_points=2000)
    for f in range(2, 8):
        db = lc.add_frame(db, to_pc(spacer), jnp.int32(f), sc_cfg)
    db = lc.add_frame(db, to_pc(query_scan), jnp.int32(8), sc_cfg)

    def run(extra):
        cfg = LoopClosureConfig(
            frame_gap=5, sc_distance_threshold=0.4, icp_fitness_threshold=0.5,
            icp_max_iterations=15, max_candidates=1,
            verify_extra_tranches=extra,
        )
        return lc.detect(db, cfg, sc_cfg)

    det1 = run(1)
    acc = np.asarray(det1.accepted)
    dists = np.asarray(det1.sc_distance)
    # the decoy must rank first (else the test is vacuous)
    assert int(det1.match_frame[0]) == 0, (np.asarray(det1.match_frame), dists)
    assert not acc[0], np.asarray(det1.icp_fitness)
    assert acc[1], (np.asarray(det1.match_frame), np.asarray(det1.icp_fitness))
    assert int(det1.match_frame[1]) == 1
    # round-1 bounded top-K behavior loses the loop entirely
    det0 = run(0)
    assert not np.asarray(det0.accepted).any()


def test_coarse_verify_matches_plain(rng):
    """verify_coarse_iterations (coarse-to-fine verification warm start)
    accepts the same loops with the same matches and equivalent transforms:
    the coarse GN steps only move the init toward the SAME local minimum the
    full-sample loop converges to (the acceptance test runs on the converged
    full-sample fitness either way)."""
    poses, scans = make_scene_scans(rng)
    sc_cfg = ScanContextConfig()
    base = dict(frame_gap=5, sc_distance_threshold=0.35,
                icp_fitness_threshold=0.6, icp_max_iterations=15)
    db = lc.init_db(16, 2048, sc_cfg)
    for f, scan in enumerate(scans):
        db = lc.add_frame(db, to_pc(scan), jnp.int32(f), sc_cfg)
    det_plain = lc.detect(db, LoopClosureConfig(**base), sc_cfg)
    det_coarse = lc.detect(
        db,
        LoopClosureConfig(**base, verify_coarse_iterations=5,
                          verify_coarse_sample=256),
        sc_cfg,
    )
    np.testing.assert_array_equal(
        np.asarray(det_plain.accepted), np.asarray(det_coarse.accepted)
    )
    assert np.asarray(det_plain.accepted).any()
    np.testing.assert_array_equal(
        np.asarray(det_plain.match_frame), np.asarray(det_coarse.match_frame)
    )
    acc = np.asarray(det_plain.accepted)
    dT = np.asarray(det_plain.transform)[acc] - np.asarray(det_coarse.transform)[acc]
    assert np.abs(dT).max() < 5e-3, dT


def test_hoisted_coarse_matches_nested(rng):
    """detect() hoists the coarse warm start out of the per-lane ICP (to
    expose the coarse RMS for the early-reject gate); the composition must
    match running icp_point_to_plane with the SAME coarse settings nested
    inside it (ops/icp.py:164-182) — same accepted transforms and fitness."""
    from lidar_slam_tpu.config import ICPConfig
    from lidar_slam_tpu.ops.icp import icp_point_to_plane

    poses, scans = make_scene_scans(rng)
    sc_cfg = ScanContextConfig()
    cfg = LoopClosureConfig(
        frame_gap=5, sc_distance_threshold=0.35, icp_fitness_threshold=0.6,
        icp_max_iterations=15, verify_coarse_iterations=4,
        verify_coarse_sample=256,
    )
    db = lc.init_db(16, 2048, sc_cfg)
    for f, scan in enumerate(scans):
        db = lc.add_frame(db, to_pc(scan), jnp.int32(f), sc_cfg)
    det = lc.detect(db, cfg, sc_cfg)
    acc = np.asarray(det.accepted)
    assert acc.any()
    q = int(det.query_frame)
    query_cloud = PointCloud(db.clouds[q], db.cloud_mask[q])
    icp_cfg = ICPConfig(
        max_iterations=15, tolerance=cfg.verify_tolerance, sample_points=0,
        coarse_iterations=4, coarse_sample=256,
    )
    for k in np.nonzero(acc)[0]:
        m = int(det.match_frame[k])
        res = icp_point_to_plane(
            query_cloud,
            PointCloud(db.clouds[m], db.cloud_mask[m]),
            db.normals[m],
            icp_cfg,
        )
        np.testing.assert_allclose(
            np.asarray(res.transformation), np.asarray(det.transform[k]),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            float(res.final_error), float(det.icp_fitness[k]), rtol=1e-4,
        )
        # the hoisted coarse RMS was recorded for the lane
        assert np.isfinite(float(det.coarse_fitness[k]))


def test_coarse_reject_gate(rng):
    """verify_coarse_reject: a never-binding threshold is a no-op (identical
    detections); a zero-margin threshold rejects every candidate without
    running the fine phase (fine_fired False, all fitness inf)."""
    poses, scans = make_scene_scans(rng)
    sc_cfg = ScanContextConfig()
    base = dict(
        frame_gap=5, sc_distance_threshold=0.35, icp_fitness_threshold=0.6,
        icp_max_iterations=15, verify_coarse_iterations=4,
        verify_coarse_sample=256,
    )
    db = lc.init_db(16, 2048, sc_cfg)
    for f, scan in enumerate(scans):
        db = lc.add_frame(db, to_pc(scan), jnp.int32(f), sc_cfg)

    det_off = lc.detect(db, LoopClosureConfig(**base), sc_cfg)
    det_loose = lc.detect(
        db, LoopClosureConfig(**base, verify_coarse_reject=1e9), sc_cfg
    )
    np.testing.assert_array_equal(
        np.asarray(det_off.accepted), np.asarray(det_loose.accepted)
    )
    np.testing.assert_array_equal(
        np.asarray(det_off.transform), np.asarray(det_loose.transform)
    )
    np.testing.assert_array_equal(
        np.asarray(det_off.icp_fitness), np.asarray(det_loose.icp_fitness)
    )
    assert np.asarray(det_off.accepted).any()
    assert bool(det_off.fine_fired) and bool(det_loose.fine_fired)
    assert int(det_off.n_valid) >= int(np.asarray(det_off.accepted).sum())

    det_tight = lc.detect(
        db, LoopClosureConfig(**base, verify_coarse_reject=1e-9), sc_cfg
    )
    assert not np.asarray(det_tight.accepted).any()
    assert not bool(det_tight.fine_fired)
    assert np.isinf(np.asarray(det_tight.icp_fitness)).all()
