import jax.numpy as jnp
import numpy as np

from lidar_slam_tpu.ops.voxel import voxel_downsample


def reference_voxel(points, voxel_size):
    """NumPy mirror of reference file_utils.cpp:148-196 (hash-map centroids)."""
    if voxel_size <= 0:
        return points
    keys = np.floor(points / voxel_size).astype(np.int64)
    buckets = {}
    for i, k in enumerate(map(tuple, keys)):
        buckets.setdefault(k, []).append(i)
    return np.stack([points[idx].mean(axis=0) for idx in buckets.values()])


def _sorted(a):
    return a[np.lexsort(a.T[::-1])]


def test_matches_reference_centroids(rng):
    pts = rng.uniform(-20, 20, size=(500, 3)).astype(np.float32)
    pad = np.zeros((512, 3), np.float32)
    pad[:500] = pts
    mask = np.zeros(512, bool)
    mask[:500] = True
    out = voxel_downsample(jnp.asarray(pad), jnp.asarray(mask), 2.0, 512)
    got = np.asarray(out.points)[np.asarray(out.mask)]
    # f32 binning (device dtype); the C++ reference bins in f64 — boundary
    # points within f32 eps of a voxel edge may land one cell over.
    ref = reference_voxel(pts, 2.0).astype(np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(_sorted(got), _sorted(ref), atol=1e-4)


def test_single_voxel_centroid():
    pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [0.3, 0.3, 0.3]], np.float32)
    pad = np.zeros((8, 3), np.float32)
    pad[:3] = pts
    mask = np.zeros(8, bool)
    mask[:3] = True
    out = voxel_downsample(jnp.asarray(pad), jnp.asarray(mask), 1.0, 4)
    assert int(out.count()) == 1
    np.testing.assert_allclose(
        np.asarray(out.points[0]), pts.mean(axis=0), atol=1e-6
    )


def test_passthrough_when_nonpositive_voxel(rng):
    pts = rng.normal(size=(16, 3)).astype(np.float32)
    mask = np.ones(16, bool)
    out = voxel_downsample(jnp.asarray(pts), jnp.asarray(mask), 0.0, 16)
    np.testing.assert_allclose(np.asarray(out.points), pts)
    assert np.asarray(out.mask).all()


def test_overflow_capacity(rng):
    # more occupied voxels than out_size: keeps exactly out_size, deterministic
    pts = (rng.uniform(-50, 50, size=(200, 3)) // 1.0).astype(np.float32) + 0.5
    mask = np.ones(200, bool)
    out = voxel_downsample(jnp.asarray(pts), jnp.asarray(mask), 1.0, 32)
    assert int(out.count()) == 32
