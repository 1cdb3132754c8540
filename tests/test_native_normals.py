"""Native C++ k-NN PCA normals vs the exact JAX estimator.

The C++ KD-tree path (native/ply_io.cpp normals_knn_impl) must reproduce the
reference's estimate_normals semantics (icp.hpp:23-67) — the same contract
ops/normals.estimate_normals(exact=True) is tested against. Skipped when the
native library cannot be built (the Python fallback IS the JAX estimator).
"""

import numpy as np
import pytest

from lidar_slam_tpu.utils.native import get_lib, normals_knn_host


def _ring_cloud(rng, n=3000):
    """A LiDAR-like scene: ground plane + two walls, generic positions."""
    g = rng.uniform([-20, -20, -0.02], [20, 20, 0.02], (n // 2, 3))
    w1 = rng.uniform([-20, -0.02, 0], [20, 0.02, 6], (n // 4, 3))
    w2 = rng.uniform([-0.02, -20, 0], [0.02, 20, 6], (n - n // 2 - n // 4, 3))
    return np.concatenate([g, w1, w2]).astype(np.float32)


@pytest.mark.skipif(get_lib() is None, reason="native library unavailable")
def test_native_knn_normals_match_jax(rng):
    import jax.numpy as jnp

    from lidar_slam_tpu.ops.normals import estimate_normals

    pts = _ring_cloud(rng)
    n_native = normals_knn_host(pts, k=20)
    n_jax = np.asarray(
        estimate_normals(
            jnp.asarray(pts), jnp.ones(len(pts), bool), k=20, exact=True
        )
    )
    # unit + z-oriented
    assert np.abs(np.linalg.norm(n_native, axis=1) - 1).max() < 1e-4
    assert (n_native[:, 2] >= -1e-6).all()
    # same neighborhoods -> same plane: compare by angle. Points on an
    # exact edge between two planes have a genuinely ambiguous normal and
    # f32/f64 rank ties can flip which plane wins — require p98 < 1 degree
    # and median essentially exact.
    dots = np.clip(np.abs(np.sum(n_native * n_jax, axis=1)), -1, 1)
    ang = np.degrees(np.arccos(dots))
    assert np.percentile(ang, 98) < 1.0, np.percentile(ang, [50, 90, 98, 100])
    assert np.median(ang) < 0.05


@pytest.mark.skipif(get_lib() is None, reason="native library unavailable")
def test_native_knn_normals_plane_exact(rng):
    """Normals of a clean plane are the plane normal, regardless of k-NN
    tie-breaking order."""
    pts = rng.uniform([-5, -5, 0], [5, 5, 0], (500, 3)).astype(np.float32)
    out = normals_knn_host(pts, k=10)
    np.testing.assert_allclose(out[:, 2], 1.0, atol=1e-5)


@pytest.mark.skipif(get_lib() is None, reason="native library unavailable")
def test_native_knn_normals_degenerate():
    """< 3 points: the (0,0,1) fallback (icp.hpp:34-37)."""
    pts = np.array([[0, 0, 0], [1, 0, 0]], np.float32)
    out = normals_knn_host(pts, k=20)
    np.testing.assert_array_equal(out, [[0, 0, 1], [0, 0, 1]])
