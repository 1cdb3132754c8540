"""ctypes bindings for the native C++ data-loading runtime (native/ply_io.cpp).

Builds lazily via the Makefile on first use (g++ is in the image); every
entry point degrades gracefully to the NumPy implementations in utils/io.py
when the toolchain or library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "liblidar_native.so"))
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("LIDAR_SLAM_NO_NATIVE"):
            return None
        # Always invoke make: it's a no-op when the .so is fresh and rebuilds
        # a stale one when ply_io.cpp changed (a stale lib would lack newer
        # symbols such as lidar_prefetch_create_v2).
        if not _build() and not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        fp = ctypes.POINTER(ctypes.c_float)
        lib.lidar_load_ply.restype = ctypes.c_long
        lib.lidar_load_ply.argtypes = [ctypes.c_char_p, fp, ctypes.c_long]
        lib.lidar_load_bin.restype = ctypes.c_long
        lib.lidar_load_bin.argtypes = [ctypes.c_char_p, fp, ctypes.c_long]
        lib.lidar_write_ply.restype = ctypes.c_int
        lib.lidar_write_ply.argtypes = [ctypes.c_char_p, fp, ctypes.c_long, fp]
        lib.lidar_prefetch_create.restype = ctypes.c_void_p
        lib.lidar_prefetch_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.lidar_prefetch_create_voxel.restype = ctypes.c_void_p
        lib.lidar_prefetch_create_voxel.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.c_long,
        ]
        lib.lidar_voxel_downsample.restype = ctypes.c_long
        lib.lidar_voxel_downsample.argtypes = [
            fp, ctypes.c_long, ctypes.c_float, fp, ctypes.c_long,
        ]
        lib.lidar_normals_radius.restype = None
        lib.lidar_normals_radius.argtypes = [fp, ctypes.c_long, ctypes.c_float, fp]
        lib.lidar_prefetch_create_full.restype = ctypes.c_void_p
        lib.lidar_prefetch_create_full.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.c_long,
            ctypes.c_float,
        ]
        lib.lidar_prefetch_create_v2.restype = ctypes.c_void_p
        lib.lidar_prefetch_create_v2.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.c_long,
            ctypes.c_float,
            ctypes.c_long,
        ]
        lib.lidar_normals_knn.restype = None
        lib.lidar_normals_knn.argtypes = [fp, ctypes.c_long, ctypes.c_long, fp]
        lib.lidar_prefetch_create_v3.restype = ctypes.c_void_p
        lib.lidar_prefetch_create_v3.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.c_long,
            ctypes.c_float,
            ctypes.c_long,
            ctypes.c_long,
        ]
        lib.lidar_prefetch_get_full.restype = ctypes.c_long
        lib.lidar_prefetch_get_full.argtypes = [
            ctypes.c_void_p, ctypes.c_long, fp, fp,
        ]
        lib.lidar_prefetch_get.restype = ctypes.c_long
        lib.lidar_prefetch_get.argtypes = [ctypes.c_void_p, ctypes.c_long, fp]
        lib.lidar_prefetch_destroy.restype = None
        lib.lidar_prefetch_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def load_scan_native(path: str, cap: int = 1 << 18) -> Optional[np.ndarray]:
    """Load a .ply/.bin scan via the native parser; None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((cap, 3), np.float32)
    fn = lib.lidar_load_bin if path.endswith(".bin") else lib.lidar_load_ply
    n = fn(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap
    )
    if n < 0:
        return None
    return out[:n]


def voxel_downsample_host(pts: np.ndarray, voxel: float,
                          cap: int = 1 << 18) -> np.ndarray:
    """Host voxel-grid centroid downsample: native C++ if available, NumPy
    otherwise (semantics of reference file_utils.cpp:148-196)."""
    lib = get_lib()
    if lib is not None:
        pts = np.ascontiguousarray(pts, np.float32)
        out = np.empty((min(cap, len(pts) or 1), 3), np.float32)
        fp = ctypes.POINTER(ctypes.c_float)
        n = lib.lidar_voxel_downsample(
            pts.ctypes.data_as(fp), len(pts), ctypes.c_float(voxel),
            out.ctypes.data_as(fp), len(out),
        )
        if n >= 0:
            return out[:n]
    from .io import voxel_downsample_np

    out = voxel_downsample_np(pts, voxel)
    if len(out) <= cap:
        return out
    # over capacity: strided selection over the key-sorted voxels (a prefix
    # crop would be a spatially-biased x-band — the C++ path strides too)
    return out[(np.arange(cap) * len(out)) // cap]


class FrameLoader:
    """Asynchronous readahead frame loader over the native prefetcher.

    Overlaps disk I/O + parsing with device compute — the reference loads
    each frame synchronously inside its timer callback (slam_node.cpp:121),
    stalling the pipeline on disk. Falls back to synchronous NumPy loading.
    """

    def __init__(self, paths: List[str], cap: int = 1 << 18, window: int = 8,
                 threads: int = 2, voxel: float = 0.0, raw_cap: int = 0,
                 normals_radius: float = 0.0, start: int = 0,
                 normals_k: int = 0):
        """``start``: first frame that will be requested (checkpoint resume) —
        workers begin prefetching there instead of frame 0, so ``get(start)``
        never deadlocks behind ``window`` frames nobody will consume.

        ``normals_k > 0``: reference-exact k-NN PCA worker normals
        (icp.hpp:23-67 semantics via a KD-tree) instead of radius normals."""
        self.paths = paths
        self.cap = cap
        self.voxel = voxel
        self.normals_radius = normals_radius
        self.normals_k = normals_k
        self._handle = None
        self._lib = get_lib()
        if self._lib is not None and paths:
            arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
            self._handle = self._lib.lidar_prefetch_create_v3(
                arr, len(paths), cap, window, threads,
                ctypes.c_float(voxel), raw_cap or cap,
                ctypes.c_float(normals_radius), start, normals_k,
            )

    def get(self, frame: int) -> np.ndarray:
        if self._handle is not None:
            out = np.empty((self.cap, 3), np.float32)
            n = self._lib.lidar_prefetch_get(
                self._handle,
                frame,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            if n >= 0:
                return out[:n]
        from .io import load_scan, voxel_downsample_np

        pts = load_scan(self.paths[frame])
        if self.voxel > 0:
            pts = voxel_downsample_np(pts, self.voxel)
        return pts[: self.cap]

    def get_with_normals(self, frame: int):
        """(points, normals) — requires ``normals_radius > 0`` or
        ``normals_k > 0``."""
        if self._handle is not None and (
            self.normals_radius > 0 or self.normals_k > 0
        ):
            fp = ctypes.POINTER(ctypes.c_float)
            out = np.empty((self.cap, 3), np.float32)
            nrm = np.empty((self.cap, 3), np.float32)
            n = self._lib.lidar_prefetch_get_full(
                self._handle, frame,
                out.ctypes.data_as(fp), nrm.ctypes.data_as(fp),
            )
            if n >= 0:
                return out[:n], nrm[:n]
        pts = self.get(frame)
        if self.normals_k > 0:
            return pts, normals_knn_host(pts, self.normals_k)
        return pts, normals_radius_host(pts, self.normals_radius or 1.0)

    def close(self):
        if self._handle is not None:
            self._lib.lidar_prefetch_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        self.close()


def normals_knn_host(pts: np.ndarray, k: int = 20) -> np.ndarray:
    """Reference-exact k-NN PCA normals (icp.hpp:23-67): native C++ KD-tree
    if available, exact JAX k-NN fallback (identical semantics — see
    tests/test_native.py::test_native_knn_normals_match_jax)."""
    lib = get_lib()
    if lib is not None:
        pts = np.ascontiguousarray(pts, np.float32)
        out = np.empty_like(pts)
        fp = ctypes.POINTER(ctypes.c_float)
        lib.lidar_normals_knn(
            pts.ctypes.data_as(fp), len(pts), k, out.ctypes.data_as(fp)
        )
        return out
    import jax.numpy as jnp

    from ..ops.normals import estimate_normals

    return np.asarray(
        estimate_normals(
            jnp.asarray(pts, jnp.float32), jnp.ones(len(pts), bool),
            k=min(k, len(pts)), exact=True,
        )
    )


def normals_radius_host(pts: np.ndarray, radius: float) -> np.ndarray:
    """Host radius normals: native C++ if available, device-op fallback."""
    lib = get_lib()
    if lib is not None:
        pts = np.ascontiguousarray(pts, np.float32)
        out = np.empty_like(pts)
        fp = ctypes.POINTER(ctypes.c_float)
        lib.lidar_normals_radius(
            pts.ctypes.data_as(fp), len(pts), ctypes.c_float(radius),
            out.ctypes.data_as(fp),
        )
        return out
    import jax.numpy as jnp

    from ..ops.normals import estimate_normals_radius

    return np.asarray(
        estimate_normals_radius(
            jnp.asarray(pts, jnp.float32), jnp.ones(len(pts), bool), radius
        )
    )
