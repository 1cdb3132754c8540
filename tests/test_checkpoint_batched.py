import jax.numpy as jnp
import numpy as np

from lidar_slam_tpu.config import tiny_config
from lidar_slam_tpu.models.pipeline import SlamEngine
from lidar_slam_tpu.parallel import BatchedSlamEngine, make_mesh
from lidar_slam_tpu.utils.dataset import (
    generate_trajectory,
    generate_world,
    render_scan,
    route_half_for,
)


def _scans(n, seed=0, max_points=2500):
    half = route_half_for(60)
    world = generate_world(seed, route_half=half)
    gt = generate_trajectory(60, half=half)[:n]
    rng = np.random.default_rng(seed)
    return [render_scan(world, gt[i], rng, max_range=30.0, max_points=max_points)
            for i in range(n)], gt


def _cfg():
    return tiny_config(max_raw_points=4096, max_points=2048, lc_cloud_points=512,
                       max_frames=16).replace(voxel_size=0.8)


def test_checkpoint_resume_bitexact(tmp_path):
    scans, _ = _scans(8)
    cfg = _cfg()
    eng = SlamEngine(cfg)
    for s in scans[:5]:
        eng.push_scan(s)
    ckpt = str(tmp_path / "state.npz")
    eng.save_checkpoint(ckpt)

    # continue the original
    for s in scans[5:]:
        eng.push_scan(s)
    ref_traj = eng.trajectory()

    # resume a fresh engine from the checkpoint and continue identically
    eng2 = SlamEngine(cfg)
    eng2.load_checkpoint(ckpt)
    assert eng2.n_frames == 5
    for s in scans[5:]:
        eng2.push_scan(s)
    np.testing.assert_allclose(eng2.trajectory(), ref_traj, atol=1e-6)


def test_checkpoint_rejects_wrong_config(tmp_path):
    scans, _ = _scans(2)
    eng = SlamEngine(_cfg())
    eng.push_scan(scans[0])
    ckpt = str(tmp_path / "s.npz")
    eng.save_checkpoint(ckpt)
    other = SlamEngine(_cfg().replace(max_frames=32))
    try:
        other.load_checkpoint(ckpt)
        assert False, "expected shape mismatch"
    except (ValueError, KeyError):
        pass


def test_batched_engine_matches_single():
    """Two identical sequences batched must produce the single-engine poses."""
    scans, gt = _scans(6)
    cfg = _cfg()
    single = SlamEngine(cfg)
    for s in scans:
        single.push_scan(s)
    ref = single.trajectory()

    batched = BatchedSlamEngine(cfg, batch=2)
    for s in scans:
        batched.push_scans([s, s])
    trajs = batched.trajectories()
    assert trajs.shape[0] == 2
    np.testing.assert_allclose(trajs[0], ref, atol=1e-4)
    np.testing.assert_allclose(trajs[1], ref, atol=1e-4)


def test_batched_engine_sharded_mesh():
    scans, _ = _scans(4)
    cfg = _cfg()
    mesh = make_mesh({"seq": 2, "pts": 4})
    eng = BatchedSlamEngine(cfg, batch=2, mesh=mesh)
    for s in scans:
        eng.push_scans([s, s])
    trajs = eng.trajectories()
    assert np.isfinite(trajs).all()


def test_ring_key_prefilter_equivalence(rng):
    """Prefiltered retrieval must keep the true best match."""
    import jax.numpy as jnp

    from lidar_slam_tpu.ops.scan_context import (
        sc_distances,
        sc_distances_ring_prefiltered,
        scan_context,
    )

    descs = []
    for i in range(12):
        pts = (rng.uniform(-40, 40, (800, 3))).astype(np.float32)
        descs.append(np.asarray(scan_context(jnp.asarray(pts), jnp.ones(800, bool))))
    db = jnp.asarray(np.stack(descs))
    norms = jnp.sqrt(jnp.sum(db * db, axis=(1, 2)))
    q = db[7] + 0.01  # near-duplicate of entry 7
    full, _ = sc_distances(q, db, norms)
    pre, _ = sc_distances_ring_prefiltered(q, db, norms, k=4)
    assert int(jnp.argmin(pre)) == int(jnp.argmin(full)) == 7
    np.testing.assert_allclose(float(pre[7]), float(full[7]), atol=1e-6)


def test_batched_multi_tick_matches_single():
    """Batched engine with a cadence-SPANNING dispatch block (block = k x
    loop_check_every -> bunched vmapped multi-tick detection, the single
    engine's fast-path shape) matches the single engine."""
    scans, gt = _scans(13)
    cfg = _cfg().replace(dispatch_block=4, loop_check_every=2)
    single = SlamEngine(cfg)
    for s in scans:
        single.push_scan(s)
    single.finalize()
    ref = single.trajectory()
    ref_loops = int(single.state.loop_count)

    batched = BatchedSlamEngine(cfg, batch=2)
    assert batched._n_ticks == 2
    for s in scans:
        batched.push_scans([s, s])
    batched.finalize()
    trajs = batched.trajectories()
    assert np.asarray(batched.state.loop_count).tolist() == [ref_loops] * 2
    np.testing.assert_allclose(trajs[0], ref, atol=1e-4)
    np.testing.assert_allclose(trajs[1], ref, atol=1e-4)


def test_batched_resident_matches_streaming():
    """preload + run_preloaded (transfer-free steady state over the batch)
    must reproduce the streaming push_scans path exactly."""
    scans, _ = _scans(11)
    cfg = _cfg().replace(dispatch_block=4, loop_check_every=2)

    stream = BatchedSlamEngine(cfg, batch=2)
    for s in scans:
        stream.push_scans([s, s])
    stream.finalize()
    ref = stream.trajectories()
    ref_loops = np.asarray(stream.state.loop_count).tolist()

    res = BatchedSlamEngine(cfg, batch=2)
    res.preload([list(scans), list(scans)])
    res.run_preloaded()
    res.finalize()
    trajs = res.trajectories()
    assert np.asarray(res.state.loop_count).tolist() == ref_loops
    np.testing.assert_allclose(trajs, ref, atol=1e-5)

    # reset keeps the compiled programs and reruns identically (warmup-run)
    res.reset()
    res.run_preloaded()
    res.finalize()
    np.testing.assert_allclose(res.trajectories(), trajs, atol=1e-6)


def test_batched_block_dispatch_matches_single():
    """Batched engine with dispatch_block>1 (vmapped lax.scan blocks, one
    host->device put per block) matches the single engine bit-for-bit."""
    scans, gt = _scans(9)
    cfg = _cfg().replace(dispatch_block=2, loop_check_every=4)
    single = SlamEngine(cfg)
    for s in scans:
        single.push_scan(s)
    ref = single.trajectory()

    batched = BatchedSlamEngine(cfg, batch=2)
    for s in scans:
        batched.push_scans([s, s])
    trajs = batched.trajectories()
    np.testing.assert_allclose(trajs[0], ref, atol=1e-4)
    np.testing.assert_allclose(trajs[1], ref, atol=1e-4)
