import jax.numpy as jnp
import numpy as np

from lidar_slam_tpu.ops.normals import estimate_normals_radius
from lidar_slam_tpu.ops.normals_pallas import (
    estimate_normals_radius_pallas,
    radius_moments_pallas,
)


def test_moments_match_xla_interpret(rng):
    pts = (rng.normal(size=(300, 3)) * 10).astype(np.float32)
    mask = np.ones(300, bool)
    mask[250:] = False
    acc = np.asarray(
        radius_moments_pallas(jnp.asarray(pts), jnp.asarray(mask), 2.0,
                              ts=64, tt=128, interpret=True)
    )
    # NumPy reference moments — compare valid rows only (invalid rows sit at
    # the sentinel position and are masked downstream)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    m = (d2 < 4.0) & mask[None, :]
    cnt = m.sum(1)
    np.testing.assert_allclose(acc[mask, 0], cnt[mask], atol=0.01)
    s1 = m.astype(np.float64) @ pts.astype(np.float64)
    np.testing.assert_allclose(acc[mask, 1:4], s1[mask], rtol=1e-4, atol=1e-3)


def test_normals_match_xla_interpret(rng):
    n_true = np.array([1.0, 1.0, 3.0])
    n_true /= np.linalg.norm(n_true)
    u = np.array([1.0, -1.0, 0.0]) / np.sqrt(2)
    v = np.cross(n_true, u)
    uv = rng.uniform(-4, 4, size=(512, 2))
    pts = (uv[:, :1] * u + uv[:, 1:] * v).astype(np.float32)
    mask = np.ones(512, bool)
    got = np.asarray(
        estimate_normals_radius_pallas(
            jnp.asarray(pts), jnp.asarray(mask), 1.5, interpret=True
        )
    )
    ref = np.asarray(
        estimate_normals_radius(jnp.asarray(pts), jnp.asarray(mask), 1.5)
    )
    np.testing.assert_allclose(np.abs((got * ref).sum(1)), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.abs(got @ n_true), 1.0, atol=1e-3)
