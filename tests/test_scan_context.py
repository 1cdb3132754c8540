import jax.numpy as jnp
import numpy as np

from lidar_slam_tpu.config import ScanContextConfig
from lidar_slam_tpu.ops.scan_context import (
    ring_key,
    sc_distance,
    sc_distances,
    scan_context,
    sector_key,
    shift_to_yaw,
)


def reference_scan_context(cloud, R=20, S=60, max_range=80.0):
    """NumPy mirror of reference scan_context.hpp:44-82."""
    desc = np.full((R, S), -np.inf)
    ring_size = max_range / R
    sector_size = 2 * np.pi / S
    for x, y, z in cloud:
        rng_ = np.sqrt(x * x + y * y)
        ang = np.arctan2(y, x) + np.pi
        if rng_ > max_range or rng_ < 0.1:
            continue
        ri = min(max(int(rng_ / ring_size), 0), R - 1)
        si = min(max(int(ang / sector_size), 0), S - 1)
        desc[ri, si] = max(desc[ri, si], z)
    desc[desc < -1000] = 0
    return desc


def reference_distance(a, b):
    """NumPy mirror of reference scan_context.hpp:90-102, :121-142."""
    best = np.inf
    S = a.shape[1]
    for shift in range(S):
        bs = np.roll(b, -shift, axis=1)  # b[i, (j+shift)%S]
        ab = np.sum(a * bs)
        na, nb = np.sqrt(np.sum(a * a)), np.sqrt(np.sum(bs * bs))
        d = 1.0 if na * nb < 1e-10 else 1.0 - ab / (na * nb)
        best = min(best, d)
    return best


def make_cloud(rng, n=500):
    r = rng.uniform(1, 70, n)
    th = rng.uniform(-np.pi, np.pi, n)
    z = rng.uniform(-2, 5, n)
    return np.stack([r * np.cos(th), r * np.sin(th), z], axis=1).astype(np.float32)


def test_descriptor_matches_reference(rng):
    cloud = make_cloud(rng)
    pad = np.zeros((512, 3), np.float32)
    pad[:500] = cloud
    mask = np.zeros(512, bool)
    mask[:500] = True
    got = np.asarray(scan_context(jnp.asarray(pad), jnp.asarray(mask)))
    ref = reference_scan_context(cloud.astype(np.float64))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_distance_matches_reference(rng):
    a = reference_scan_context(make_cloud(rng)).astype(np.float32)
    b = reference_scan_context(make_cloud(rng)).astype(np.float32)
    got = float(sc_distance(jnp.asarray(a), jnp.asarray(b)))
    ref = reference_distance(a.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_distance_yaw_invariance(rng):
    """SC distance must be ~0 between a cloud and its yaw-rotated copy."""
    cloud = make_cloud(rng, 800)
    yaw = 2 * np.pi * 7 / 60  # exact multiple of sector size
    c, s = np.cos(yaw), np.sin(yaw)
    Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    rotated = cloud @ Rz.T
    mask = jnp.ones(800, bool)
    d1 = scan_context(jnp.asarray(cloud), mask)
    d2 = scan_context(jnp.asarray(rotated), mask)
    dist, shift = sc_distances(
        d1, d2[None], jnp.sqrt(jnp.sum(d2 * d2))[None]
    )
    assert float(dist[0]) < 0.02
    # recovered shift maps back to the applied yaw
    yaw_rec = float(shift_to_yaw(shift[0], 60))
    assert abs(((yaw_rec - yaw + np.pi) % (2 * np.pi)) - np.pi) < 2 * np.pi / 60 + 1e-6


def test_empty_cloud_distance_is_one():
    z = jnp.zeros((20, 60))
    d = float(sc_distance(z, z))
    assert d == 1.0  # norm < 1e-10 branch (scan_context.hpp:137-138)


def test_keys(rng):
    desc = jnp.asarray(reference_scan_context(make_cloud(rng)).astype(np.float32))
    rk = np.asarray(ring_key(desc))
    sk = np.asarray(sector_key(desc))
    np.testing.assert_allclose(rk, np.asarray(desc).mean(axis=1), atol=1e-6)
    np.testing.assert_allclose(sk, np.asarray(desc).mean(axis=0), atol=1e-6)
