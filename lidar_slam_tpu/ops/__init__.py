"""Compute kernels: SE(3) math, kNN, voxel downsample, normals, ICP,
Scan Context, occupancy mapping."""

from . import icp, knn, normals, occupancy, scan_context, se3, voxel  # noqa: F401
