import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from lidar_slam_tpu.ops import se3


def random_T(rng, max_angle=np.pi * 0.9):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = rng.uniform(-max_angle, max_angle)
    R = Rotation.from_rotvec(axis * angle).as_matrix().astype(np.float32)
    t = rng.normal(size=3).astype(np.float32)
    return se3.from_rt(jnp.asarray(R), jnp.asarray(t))


def test_from_rt_roundtrip(rng):
    T = random_T(rng)
    R, t = se3.rot(T), se3.trans(T)
    T2 = se3.from_rt(R, t)
    np.testing.assert_allclose(T, T2)
    assert T.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(T)[3], [0, 0, 0, 1])


def test_apply_compose_inverse(rng):
    A, B = random_T(rng), random_T(rng)
    pts = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    # compose then apply == apply twice
    np.testing.assert_allclose(
        se3.apply(se3.compose(A, B), pts),
        se3.apply(A, se3.apply(B, pts)),
        atol=1e-5,
    )
    # inverse undoes
    np.testing.assert_allclose(
        se3.apply(se3.inverse(A), se3.apply(A, pts)), pts, atol=1e-5
    )


def test_exp_so3_matches_scipy(rng):
    for _ in range(20):
        w = rng.normal(size=3).astype(np.float32) * rng.uniform(0, 3)
        R = se3.exp_so3(jnp.asarray(w))
        R_ref = Rotation.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)


def test_exp_so3_tiny_angle():
    R = se3.exp_so3(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)
    w = jnp.asarray([1e-9, -1e-9, 1e-9])
    np.testing.assert_allclose(np.asarray(se3.exp_so3(w)), np.eye(3), atol=1e-6)


@pytest.mark.parametrize("angle", [1e-7, 0.1, 1.5, np.pi - 1e-3, np.pi])
def test_log_so3_roundtrip(rng, angle):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    w = (axis * angle).astype(np.float32)
    R = se3.exp_so3(jnp.asarray(w))
    w2 = np.asarray(se3.log_so3(R))
    # log may return the equivalent rotation vector; compare rotations
    R2 = Rotation.from_rotvec(w2).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R2, atol=2e-3 if angle > 3 else 1e-4)


def test_se3_exp_log_roundtrip(rng):
    for _ in range(20):
        xi = rng.normal(size=6).astype(np.float32)
        T = se3.exp(jnp.asarray(xi))
        xi2 = np.asarray(se3.log(T))
        np.testing.assert_allclose(xi, xi2, atol=1e-4)


def test_se3_exp_batched(rng):
    xi = rng.normal(size=(5, 6)).astype(np.float32)
    T = se3.exp(jnp.asarray(xi))
    assert T.shape == (5, 4, 4)
    for i in range(5):
        np.testing.assert_allclose(
            np.asarray(T[i]), np.asarray(se3.exp(jnp.asarray(xi[i]))), atol=1e-6
        )


def test_orthonormalize(rng):
    T = random_T(rng)
    noisy = T.at[:3, :3].add(jnp.asarray(rng.normal(size=(3, 3)) * 1e-3, jnp.float32))
    fixed = se3.orthonormalize(noisy)
    R = np.asarray(se3.rot(fixed))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
