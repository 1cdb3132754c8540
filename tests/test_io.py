import os

import numpy as np

from lidar_slam_tpu.utils.io import (
    convert_bin_to_ply,
    convert_directory,
    discover_frames,
    extract_timestamp,
    load_bin,
    load_ply,
    load_scan,
    save_ply,
)


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32) * 50
    path = str(tmp_path / "0001.ply")
    save_ply(path, pts)
    back = load_ply(path)
    np.testing.assert_allclose(back, pts)


def test_ply_with_intensity_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    inten = rng.uniform(size=100).astype(np.float32)
    path = str(tmp_path / "0002.ply")
    save_ply(path, pts, inten)
    back = load_ply(path)  # x,y,z extracted despite extra property
    np.testing.assert_allclose(back, pts)


def test_ascii_ply(tmp_path):
    path = str(tmp_path / "a.ply")
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex 2\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n1.0 2.0 3.0\n4.0 5.0 6.0\n"
        )
    back = load_ply(path)
    np.testing.assert_allclose(back, [[1, 2, 3], [4, 5, 6]])


def test_bin_roundtrip(tmp_path, rng):
    data = rng.normal(size=(200, 4)).astype(np.float32)
    path = str(tmp_path / "000000.bin")
    data.tofile(path)
    back = load_bin(path)
    np.testing.assert_allclose(back, data[:, :3])
    np.testing.assert_allclose(load_scan(path), data[:, :3])


def test_convert_tool(tmp_path, rng):
    data = rng.normal(size=(50, 4)).astype(np.float32)
    binp = str(tmp_path / "000007.bin")
    data.tofile(binp)
    plyp = str(tmp_path / "000007.ply")
    n = convert_bin_to_ply(binp, plyp)
    assert n == 50
    np.testing.assert_allclose(load_ply(plyp), data[:, :3])


def test_discover_frames_sorted(tmp_path, rng):
    for ts in [300, 100, 200]:
        save_ply(str(tmp_path / f"{ts}.ply"), rng.normal(size=(5, 3)).astype(np.float32))
    frames = discover_frames(str(tmp_path))
    assert [f[0] for f in frames] == [100, 200, 300]
    assert extract_timestamp("12345.ply") == 12345
    assert extract_timestamp("nonumber.ply") == -1


def test_convert_directory(tmp_path, rng):
    ind = tmp_path / "in"
    outd = tmp_path / "out"
    ind.mkdir()
    for i in range(3):
        rng.normal(size=(10, 4)).astype(np.float32).tofile(str(ind / f"{i:06d}.bin"))
    n = convert_directory(str(ind), str(outd))
    assert n == 3
    assert len(os.listdir(outd)) == 3


def test_frameloader_resume_start(tmp_path, rng):
    """Prefetch workers start at the resume frame: get(start) with
    start >= window must not deadlock (round-1 resume hang)."""
    from lidar_slam_tpu.utils.native import FrameLoader

    paths = []
    for i in range(12):
        p = str(tmp_path / f"{i:06d}.ply")
        save_ply(p, np.full((20, 3), float(i), np.float32))
        paths.append(p)
    ld = FrameLoader(paths, cap=64, window=4, threads=2, start=8)
    try:
        for f in range(8, 12):
            pts = ld.get(f)
            assert pts.shape[0] == 20
            np.testing.assert_allclose(pts[0], [f, f, f])
    finally:
        ld.close()


def test_double_precision_ply(tmp_path, rng):
    """PLY with double x/y/z parses correctly via every path (the native
    fast path must convert or decline — not reinterpret bytes)."""
    pts = rng.normal(size=(50, 3)).astype(np.float64) * 10
    path = str(tmp_path / "d.ply")
    header = (
        "ply\nformat binary_little_endian 1.0\nelement vertex 50\n"
        "property double x\nproperty double y\nproperty double z\n"
        "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(pts.astype("<f8").tobytes())
    got = load_ply(path)
    np.testing.assert_allclose(got, pts.astype(np.float32), atol=1e-5)
    # the dispatching loader (used by FrameLoader fallbacks) agrees
    from lidar_slam_tpu.utils.io import load_scan

    np.testing.assert_allclose(load_scan(path), got)
    from lidar_slam_tpu.utils.native import load_scan_native, native_available

    if native_available():
        native = load_scan_native(path)
        if native is not None:  # native may decline (returns None) -> OK
            np.testing.assert_allclose(native, got, atol=1e-5)
