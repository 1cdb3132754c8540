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
