import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from lidar_slam_tpu.ops.knn import knn, nn1


def test_nn1_matches_scipy(rng):
    src = rng.normal(size=(300, 3)).astype(np.float32) * 10
    tgt = rng.normal(size=(512, 3)).astype(np.float32) * 10
    mask = np.ones(512, bool)
    idx, d2 = nn1(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask), chunk=128)
    ref_d, ref_i = cKDTree(tgt).query(src, k=1)
    np.testing.assert_array_equal(np.asarray(idx), ref_i)
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), ref_d, atol=1e-3)


def test_nn1_respects_target_mask(rng):
    src = rng.normal(size=(64, 3)).astype(np.float32)
    tgt = rng.normal(size=(128, 3)).astype(np.float32)
    mask = np.zeros(128, bool)
    mask[:40] = True
    idx, _ = nn1(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask), chunk=32)
    assert np.asarray(idx).max() < 40
    ref_d, ref_i = cKDTree(tgt[:40]).query(src, k=1)
    np.testing.assert_array_equal(np.asarray(idx), ref_i)


def test_knn_matches_scipy(rng):
    pts = rng.normal(size=(256, 3)).astype(np.float32) * 5
    mask = np.ones(256, bool)
    k = 8
    idx, d2 = knn(jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(mask), k=k, chunk=64)
    ref_d, ref_i = cKDTree(pts).query(pts, k=k)
    # Sets of neighbors must match (order among ties may differ)
    got_d = np.sort(np.sqrt(np.asarray(d2)), axis=1)
    np.testing.assert_allclose(got_d, np.sort(ref_d, axis=1), atol=1e-3)
    same = [set(np.asarray(idx)[i]) == set(ref_i[i]) for i in range(256)]
    assert np.mean(same) > 0.99  # allow rare distance ties


def test_knn_masked_padding(rng):
    pts = rng.normal(size=(128, 3)).astype(np.float32)
    mask = np.zeros(128, bool)
    mask[:50] = True
    idx, d2 = knn(jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(mask), k=4, chunk=32)
    # valid rows only ever pick valid neighbors
    assert np.asarray(idx)[:50].max() < 50
