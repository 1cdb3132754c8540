import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from lidar_slam_tpu.ops.knn_pallas import nn1_pallas


def test_nn1_pallas_matches_scipy_interpret(rng):
    src = (rng.normal(size=(300, 3)) * 20).astype(np.float32)
    tgt = (rng.normal(size=(700, 3)) * 20).astype(np.float32)
    mask = np.ones(700, bool)
    idx, d2 = nn1_pallas(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask),
        ts=64, tt=256, interpret=True,
    )
    ref_d, ref_i = cKDTree(tgt).query(src, k=1)
    np.testing.assert_array_equal(np.asarray(idx), ref_i)
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), ref_d, atol=1e-3)


def test_nn1_pallas_respects_mask_interpret(rng):
    src = rng.normal(size=(64, 3)).astype(np.float32)
    tgt = rng.normal(size=(256, 3)).astype(np.float32)
    mask = np.zeros(256, bool)
    mask[:100] = True
    idx, _ = nn1_pallas(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask),
        ts=64, tt=128, interpret=True,
    )
    assert np.asarray(idx).max() < 100
    ref_d, ref_i = cKDTree(tgt[:100]).query(src, k=1)
    np.testing.assert_array_equal(np.asarray(idx), ref_i)


def test_nn1_pallas_unaligned_sizes_interpret(rng):
    # sizes not multiples of the tiles: padding must not change results
    src = (rng.normal(size=(137, 3)) * 50).astype(np.float32)
    tgt = (rng.normal(size=(501, 3)) * 50).astype(np.float32)
    mask = np.ones(501, bool)
    idx, d2 = nn1_pallas(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask),
        ts=64, tt=128, interpret=True,
    )
    ref_d, ref_i = cKDTree(tgt).query(src, k=1)
    np.testing.assert_array_equal(np.asarray(idx), ref_i)
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), ref_d, atol=1e-3)


def _sorted_cloud(rng, n, scale=30.0):
    pts = (rng.normal(size=(n, 3)) * scale).astype(np.float32)
    return pts[np.argsort(pts[:, 0])]


def test_nn1_slab_pallas_matches_scipy_interpret(rng):
    from lidar_slam_tpu.ops.knn_pallas import nn1_slab_pallas

    tgt = _sorted_cloud(rng, 3000)
    src = tgt + rng.normal(size=tgt.shape).astype(np.float32) * 0.3
    src = src[np.argsort(src[:, 0])][:2000]
    mask = np.ones(3000, bool)
    idx, d2 = nn1_slab_pallas(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask),
        ts=128, window=1024, interpret=True,
    )
    ref_d, ref_i = cKDTree(tgt).query(src, k=1)
    np.testing.assert_array_equal(np.asarray(idx), ref_i)
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), ref_d, atol=1e-3)


def test_match_slab_pallas_fused_gather_interpret(rng):
    from lidar_slam_tpu.ops.knn_pallas import match_slab_pallas, nn1_slab_pallas

    tgt = _sorted_cloud(rng, 2000, scale=50.0)
    src = tgt + rng.normal(size=tgt.shape).astype(np.float32) * 0.2
    src = src[np.argsort(src[:, 0])][:1500]
    mask = np.ones(2000, bool)
    normals = rng.normal(size=(2000, 3)).astype(np.float32)
    idx, d2 = nn1_slab_pallas(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask),
        ts=128, window=1024, interpret=True,
    )
    q, n, d2f = match_slab_pallas(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask),
        jnp.asarray(normals), ts=128, window=1024, interpret=True,
    )
    # fused in-kernel selection must be bit-exact vs gather-by-index
    np.testing.assert_array_equal(np.asarray(q), tgt[np.asarray(idx)])
    np.testing.assert_array_equal(np.asarray(n), normals[np.asarray(idx)])
    np.testing.assert_array_equal(np.asarray(d2f), np.asarray(d2))


def test_nn1_slab_pallas_respects_mask_interpret(rng):
    from lidar_slam_tpu.ops.knn_pallas import nn1_slab_pallas

    tgt = _sorted_cloud(rng, 1000, scale=10.0)
    src = tgt[:500] + 0.05
    mask = np.zeros(1000, bool)
    mask[:700] = True
    idx, _ = nn1_slab_pallas(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask),
        ts=128, window=512, interpret=True,
    )
    assert np.asarray(idx).max() < 700
