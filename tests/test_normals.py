import jax.numpy as jnp
import numpy as np

from lidar_slam_tpu.ops.normals import estimate_normals, smallest_eigvec_3x3


def test_smallest_eigvec_matches_numpy(rng):
    for _ in range(50):
        B = rng.normal(size=(3, 3))
        A = (B @ B.T).astype(np.float32)
        v = np.asarray(smallest_eigvec_3x3(jnp.asarray(A)))
        w, V = np.linalg.eigh(A)
        ref = V[:, 0]
        # direction match up to sign
        assert abs(abs(v @ ref) - 1.0) < 1e-3, (v, ref)


def test_smallest_eigvec_batched(rng):
    B = rng.normal(size=(16, 3, 3))
    A = (B @ np.swapaxes(B, 1, 2)).astype(np.float32)
    v = np.asarray(smallest_eigvec_3x3(jnp.asarray(A)))
    assert v.shape == (16, 3)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)


def test_plane_normals(rng):
    # synthetic tilted plane: normals must equal the plane normal, z-oriented
    n_true = np.array([1.0, 2.0, 2.0])
    n_true /= np.linalg.norm(n_true)
    u = np.array([2.0, -1.0, 0.0]) / np.sqrt(5)
    v = np.cross(n_true, u)
    uv = rng.uniform(-5, 5, size=(256, 2))
    pts = (uv[:, :1] * u + uv[:, 1:] * v).astype(np.float32)
    mask = np.ones(256, bool)
    normals = np.asarray(estimate_normals(jnp.asarray(pts), jnp.asarray(mask), k=10))
    dots = normals @ n_true
    np.testing.assert_allclose(np.abs(dots), 1.0, atol=1e-3)
    assert (normals[:, 2] >= 0).all()  # z-orientation convention (icp.hpp:59-61)


def test_degenerate_rows_get_up_vector():
    pts = np.zeros((8, 3), np.float32)
    mask = np.zeros(8, bool)
    mask[:2] = True  # fewer than 3 valid points
    normals = np.asarray(estimate_normals(jnp.asarray(pts), jnp.asarray(mask), k=4))
    np.testing.assert_allclose(normals, np.tile([0, 0, 1.0], (8, 1)))
