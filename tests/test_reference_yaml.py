"""Config-loader parity against the five shipped reference YAML files.

The reference loads layered ROS YAML (base + environment overlay, or the
self-contained Oxford file) and computes several derived parameters at load
time (``ndt_slam.cpp:397-712``).  These tests drive ``from_reference_yaml``
on the REAL files under ``/root/reference`` and assert the derived values the
reference's arithmetic produces.
"""

import os

import numpy as np
import pytest

from randt_slam_tpu.config import from_reference_yaml

REF_CFG = "/root/reference/ros/ndt_radar_slam/config"
BASE = os.path.join(REF_CFG, "ndt_radar_slam_base_parameters.yaml")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_CFG), reason="reference checkout not available"
)


def _overlay(name):
    return from_reference_yaml(BASE, os.path.join(REF_CFG, name))


def test_oxford_self_contained():
    cfg = from_reference_yaml(os.path.join(REF_CFG, "parameters_oxford.yaml"))
    # size is meters in YAML, divided by resolution (ndt_slam.cpp:653-654)
    assert cfg.ndt_map.resolution == 3.5
    assert cfg.ndt_map.size_x == 114 and cfg.ndt_map.size_y == 114
    # OGM sizes + derived submap extent (ndt_slam.cpp:664-667)
    assert cfg.ogm.size_x == 900 and cfg.ogm.size_y == 400
    assert cfg.ogm.submap_size_x == int(114 * 3.5 / 0.1)
    # n_clusters = (2*max_range/resolution)^2 (ndt_slam.cpp:691)
    assert cfg.preprocessor.max_range == 100
    assert cfg.preprocessor.n_clusters == int((2 * 100 / 3.5) ** 2)
    # insertion_delay = smoothing_steps + 1 (ndt_slam.cpp:580)
    assert cfg.matcher.smoothing_steps == 3
    assert cfg.local_fuser.insertion_delay == 4
    # min_points_per_cell mirrored into the preprocessor (ndt_slam.cpp:671-676)
    assert cfg.preprocessor.min_points_per_cell == cfg.ndt_map.min_points_per_cell


def test_indoor_overlay():
    cfg = _overlay("parameters_indoor.yaml")
    assert cfg.ndt_map.resolution == 0.5
    assert cfg.ndt_map.size_x == 100  # 50 m / 0.5 m
    assert cfg.ndt_map.min_points_per_cell == 5
    assert cfg.ndt_map.max_neighbour_linf_distance == 4.0
    # window radius covers the reference ring search extent
    assert cfg.ndt_map.nn_window_radius == int(4.0 / 0.5) - 1
    assert cfg.preprocessor.n_clusters == int((2 * 12.0 / 0.5) ** 2)
    assert cfg.local_fuser.insertion_delay == 4
    assert cfg.use_imu and cfg.matcher.use_imu  # base sets use_imu: true
    # explicit loop params (no cascade)
    assert cfg.local_fuser.loop_closure_gnc_steps == 2
    assert cfg.local_fuser.loop_closure_scale == 1.5
    # scan-context overlay
    assert cfg.scan_context.num_ring == 20
    assert cfg.scan_context.num_sector == 45
    assert cfg.scan_context.dist_threshold == 0.6


@pytest.mark.parametrize("name,res,ogm_m", [
    ("parameters_outdoor.yaml", 1.2, (40, 90)),
    ("parameters_mixed.yaml", 1.0, (90, 90)),
])
def test_outdoor_mixed_overlays(name, res, ogm_m):
    cfg = _overlay(name)
    assert cfg.ndt_map.resolution == res
    # NDT map extent (50 m) comes from the BASE file; the overlay only
    # changes the resolution — layered-merge semantics.
    assert cfg.ndt_map.size_x == int(50 / res)
    assert cfg.ogm.size_x == int(ogm_m[0] / 0.1)
    assert cfg.ogm.size_y == int(ogm_m[1] / 0.1)
    assert cfg.preprocessor.n_clusters == int((2 * 16.0 / res) ** 2)
    # explicit loop params in both overlays
    assert cfg.local_fuser.loop_closure_gnc_steps == 1
    assert cfg.local_fuser.loop_closure_scale == 2.0
    # matcher values flow through
    assert cfg.matcher.gnc_steps == 3
    assert cfg.matcher.loss_function_scale == 2.0


def test_cascades_when_loop_keys_absent(tmp_path):
    """``ndt_slam.cpp:573-586,614-616``: loop params default to matcher
    values only when the YAML omits them."""
    p = tmp_path / "min.yaml"
    p.write_text(
        "ndt_matcher:\n"
        "  gnc_steps: 7\n"
        "  loss_function_scale: 2.5\n"
        "  use_intensity_as_dimension: false\n"
        "ndt_map:\n"
        "  size_x: 70\n  size_y: 70\n  resolution: 2.0\n"
    )
    cfg = from_reference_yaml(str(p))
    assert cfg.local_fuser.loop_closure_gnc_steps == 7
    assert cfg.local_fuser.loop_closure_scale == 2.5
    assert cfg.local_fuser.use_intensity_in_loop_closure is False
    assert cfg.ndt_map.size_x == 35


def test_matrices_are_column_major():
    """Flat YAML lists feed Eigen (column-major) matrices
    (``ndt_slam.cpp:513,556,683``)."""
    cfg = _overlay("parameters_indoor.yaml")
    sqrtI = np.asarray(cfg.matcher.motion_sqrt_information)
    assert sqrtI.shape == (8, 8)
    # the shipped matrix is diagonal -> symmetric; check the diagonal values
    assert np.allclose(np.diag(sqrtI),
                       [1.0, 1.0, 1.0, 1.0, 3.0, 0.1, 20.0, 60.0])
    beam = np.asarray(cfg.ndt_map.cell.beam_cov)
    assert np.allclose(np.diag(beam), [0.0349208, 0.001, 10.0])
