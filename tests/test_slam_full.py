"""Full SLAM (odometry + batched loop closure + pose-graph optimization) on a
synthetic looping trajectory — the system test analogous to the reference's
offline replay + ATE evaluation (SURVEY.md §4)."""

import dataclasses

import numpy as np
import pytest

from randt_slam_tpu.config import ScanContextConfig
from randt_slam_tpu.io import synthetic, formats
from randt_slam_tpu.pipeline import slam

from tests.test_odometry_e2e import small_cfg


@pytest.fixture(scope="module")
def loop_setup():
    cfg = small_cfg()
    cfg = dataclasses.replace(
        cfg,
        scan_context=ScanContextConfig(
            num_ring=20, num_sector=60, max_radius=80.0,
            num_exclude_recent=20, num_candidates=5,
            dist_threshold=0.7, odom_weight=0.05, odom_eps=4.0,
            assumed_drift=0.05, intensity_factor=0.01,
        ),
        local_fuser=dataclasses.replace(cfg.local_fuser, csm_prealign_loops=True),
        matcher=dataclasses.replace(cfg.matcher, csm_window_linear=12.0,
                                    csm_window_angular=0.6, csm_n_iter=3),
    )
    seq = synthetic.generate(seed=7, n_frames=130, n_azimuths=256, n_bins=256,
                             speed=4.0, dt=0.25, loop=True, n_walls=80)
    frames = slam.frames_from_arrays(
        seq.intensity, seq.azimuths, seq.ranges, seq.stamps
    )
    res = slam.run_slam(cfg, frames)
    return cfg, seq, res


def test_loop_closures_found(loop_setup):
    cfg, seq, res = loop_setup
    assert res.loops.n_sc_candidates > 0, "ScanContext found no candidates"
    assert res.loops.n_accepted > 0, "no loop survived the CS-divergence gate"
    # loop edges connect a submap root to a later query node
    assert np.all(res.loops.edge_begin < res.loops.edge_end)


def test_pgo_improves_node_ate(loop_setup):
    cfg, seq, res = loop_setup
    odo = res.odometry
    gt = seq.gt_poses[odo.node_frame]
    ate_before = formats.ate(odo.node_pose, gt, align=True)
    ate_after = formats.ate(res.node_pose_optimized, gt, align=True)
    # On a closed loop, PGO must not degrade and should typically improve.
    assert ate_after <= ate_before * 1.05, (ate_before, ate_after)
    assert ate_after < 2.0, ate_after


def test_submaps_reanchored(loop_setup):
    cfg, seq, res = loop_setup
    odo = res.odometry
    n = odo.n_submaps
    np.testing.assert_allclose(
        res.submap_origin_optimized[:n],
        res.node_pose_optimized[odo.submap_root[:n]],
        atol=1e-5,
    )
