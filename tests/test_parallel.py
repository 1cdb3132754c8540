import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_slam_tpu.ops.knn import nn1
from lidar_slam_tpu.parallel import (
    make_mesh,
    nn1_source_sharded,
    nn1_target_sharded,
)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh({"seq": 2, "pts": 4})


def test_mesh_factorization():
    m = make_mesh()
    assert int(np.prod(tuple(m.shape.values()))) == len(jax.devices())


def test_target_sharded_matches_single(mesh8, rng):
    src = (rng.normal(size=(256, 3)) * 10).astype(np.float32)
    tgt = (rng.normal(size=(512, 3)) * 10).astype(np.float32)
    mask = np.ones(512, bool)
    mask[400:] = False
    idx_s, d2_s = nn1_target_sharded(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask), mesh8, axis="pts"
    )
    idx_r, d2_r = nn1(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_r))
    np.testing.assert_allclose(np.asarray(d2_s), np.asarray(d2_r), rtol=1e-5)


def test_source_sharded_matches_single(mesh8, rng):
    src = (rng.normal(size=(256, 3)) * 10).astype(np.float32)
    tgt = (rng.normal(size=(512, 3)) * 10).astype(np.float32)
    mask = np.ones(512, bool)
    idx_s, d2_s = nn1_source_sharded(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask), mesh8, axis="pts"
    )
    idx_r, d2_r = nn1(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_r))
    np.testing.assert_allclose(np.asarray(d2_s), np.asarray(d2_r), rtol=1e-5)


def test_sc_topk_sharded_matches_single(mesh8, rng):
    """DB-sharded Scan-Context retrieval == single-device retrieval + top-k
    (candidate set, distances, yaw shifts) on an 8-device mesh."""
    from lidar_slam_tpu.ops.scan_context import sc_distances
    from lidar_slam_tpu.parallel import sc_topk_sharded

    F, R, S, k = 64, 20, 60, 8
    db = rng.uniform(0, 5, (F, R, S)).astype(np.float32)
    db[50:] = 0.0  # padding entries (reference: distance 1.0)
    dbn = np.sqrt((db.reshape(F, -1) ** 2).sum(axis=1)).astype(np.float32)
    # query resembling entry 12 rotated by 7 sectors -> a true near match
    q = np.roll(db[12], 7, axis=1) + rng.normal(0, 0.01, (R, S)).astype(np.float32)

    d_ref, s_ref = sc_distances(jnp.asarray(q), jnp.asarray(db), jnp.asarray(dbn))
    neg, idx_ref = jax.lax.top_k(-d_ref, k)
    d_sh, idx_sh, s_sh = sc_topk_sharded(
        jnp.asarray(q), jnp.asarray(db), jnp.asarray(dbn), k, mesh8,
        axis="pts",
    )
    # distances agree to f32 reduction noise (per-shard matmul tilings
    # differ from the whole-DB matmul); the candidate SET and order match
    np.testing.assert_allclose(
        np.asarray(d_sh), np.asarray(-neg), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(idx_sh), np.asarray(idx_ref))
    np.testing.assert_array_equal(
        np.asarray(s_sh), np.asarray(s_ref)[np.asarray(idx_ref)]
    )
