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
