"""CLI mode presets build the configurations they promise.

VERDICT r3 item 5: the product CLI must reach the benchmarked
configuration (--mode fast) and the reference-exact one (--mode fidelity);
explicit flags must override either. These tests exercise the flag ->
SlamConfig mapping without any device work.
"""

import argparse

from lidar_slam_tpu.cli import _build_config


def _args(**over):
    base = dict(
        preset="default", mode="default", voxel_size=0.5,
        max_iterations=None, tolerance=None, grid_resolution=0.2,
        height_min=0.3, height_max=2.0, max_range=40.0,
        max_points=0, lc_points=0, max_raw_points=0, max_frames=0,
        knn_backend="", icp_sample=None, warm_start=False,
        dispatch_block=None, normal_method="", probe_stride=0,
        normal_stride=0, no_midrun_optimize=False,
    )
    base.update(over)
    return argparse.Namespace(**base)


def test_default_mode_is_reference_defaults():
    cfg = _build_config(_args())
    assert cfg.icp.max_iterations == 50          # types.hpp:144
    assert cfg.icp.tolerance == 1e-6             # types.hpp:145
    assert cfg.icp.sample_points == 0
    assert not cfg.icp.warm_start
    assert cfg.knn_backend == "auto"
    assert cfg.optimize_midrun                   # slam_node.cpp:112-115


def test_fast_mode_is_the_benchmarked_config():
    cfg = _build_config(_args(mode="fast"))
    assert cfg.icp.max_iterations == 20
    assert cfg.icp.tolerance == 3e-4
    assert cfg.icp.sample_points == 4096
    assert cfg.icp.warm_start
    assert cfg.knn_backend == "slab_pallas"
    assert cfg.dispatch_block == 50
    assert not cfg.optimize_midrun
    assert cfg.normal_probe_stride == 2
    assert cfg.lc.verify_sample == 4096
    assert cfg.lc.verify_coarse_iterations == 3
    assert cfg.lc.yaw_seed
    assert cfg.lc.verify_coarse_reject == 0.6


def test_fidelity_mode_is_reference_exact():
    cfg = _build_config(_args(mode="fidelity"))
    assert cfg.icp.max_iterations == 50
    assert cfg.icp.tolerance == 1e-6
    assert cfg.icp.sample_points == 0
    assert not cfg.icp.warm_start
    assert cfg.knn_backend == "auto"
    assert cfg.optimize_midrun
    assert cfg.lc.verify_sample == 0
    assert cfg.lc.verify_tolerance == 1e-6
    assert cfg.lc.verify_coarse_iterations == 0
    assert not cfg.lc.yaw_seed
    assert cfg.lc.verify_coarse_reject == 0.0


def test_explicit_flags_override_mode():
    cfg = _build_config(_args(
        mode="fast", max_iterations=33, tolerance=1e-5, icp_sample=0,
        knn_backend="pallas", dispatch_block=10, probe_stride=3,
    ))
    assert cfg.icp.max_iterations == 33
    assert cfg.icp.tolerance == 1e-5
    assert cfg.icp.sample_points == 0
    assert cfg.knn_backend == "pallas"
    assert cfg.dispatch_block == 10
    assert cfg.normal_probe_stride == 3


def test_lane_names_disambiguate_duplicates():
    from lidar_slam_tpu.cli import _lane_names

    assert _lane_names(["/a/s0", "/a/s1"]) == ["s0", "s1"]
    # same dir in two lanes must not overwrite each other's exports
    assert _lane_names(["/a/seq", "/b/seq"]) == ["lane0_seq", "lane1_seq"]
    assert _lane_names(["/a/seq/", "/a/seq"]) == ["lane0_seq", "lane1_seq"]
