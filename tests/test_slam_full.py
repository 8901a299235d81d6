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


def test_render_ogm(loop_setup):
    """OGM post-pass (``raytrace``/``visualizeMap``): free space carved below
    zero along rays, hits accumulated positive, submaps fused globally."""
    cfg, seq, res = loop_setup
    res_ogm = 2.0
    m = cfg.ndt_map  # already derived: size_* in cells
    sub_cells = int(m.size_x * m.resolution / res_ogm)
    cfg_ogm = dataclasses.replace(
        cfg, ogm=dataclasses.replace(
            cfg.ogm, resolution=res_ogm, size_x=300, size_y=300,
            submap_size_x=sub_cells, submap_size_y=sub_cells,
        ),
    )
    frames = slam.frames_from_arrays(
        seq.intensity, seq.azimuths, seq.ranges, seq.stamps
    )
    grid, counts = slam.render_ogm(cfg_ogm, res, frames)
    n_sub = res.odometry.n_submaps
    assert counts.shape[0] == n_sub
    assert counts.min() < 0, "no free-space decrements"
    assert counts.max() >= 2, "no hit increments"
    assert np.isfinite(grid).all()
    # occupied and free both appear in the fused global map
    assert (grid > 50).sum() > 0 and (grid == 0).sum() > 0


def test_mahalanobis_loop_detection(loop_setup):
    """Variant B (``use_scan_context_as_loop_closure: false``): position
    data association finds and gates loop closures on the closed loop."""
    cfg, seq, res = loop_setup
    from randt_slam_tpu.loops import detector

    frames = slam.frames_from_arrays(
        seq.intensity, seq.azimuths, seq.ranges, seq.stamps
    )
    loops = detector.detect_loops_mahalanobis(
        dataclasses.replace(
            cfg,
            local_fuser=dataclasses.replace(
                cfg.local_fuser,
                use_scan_context_as_loop_closure=False,
                max_data_association_mahalanobis_dist=8.0,
            ),
        ),
        res.odometry, frames,
    )
    assert loops.n_sc_candidates > 0, "no Mahalanobis association candidates"
    assert loops.n_accepted > 0, "no variant-B loop survived the CS gate"
    assert np.all(loops.edge_begin < loops.edge_end)


def test_odom_consistency_gate():
    """Replicates the 10-12-32 acceptance failure: one refined loop edge with
    a 4.3 deg relative-yaw error over a ~900 m span (vs <=0.3 deg for every
    genuine edge) slipped under the CS gate and bent the whole unconstrained
    arc at PGO.  The odometry-consistency gate must reject exactly that edge
    profile and keep drift-consistent ones."""
    import numpy as np

    from randt_slam_tpu.config import SlamConfig
    from randt_slam_tpu.loops.detector import odom_consistency_gate

    lcfg = SlamConfig().local_fuser
    rel_odom = np.array([[20.0, 1.8, 3.07],     # the bad edge's span
                         [20.0, 1.8, 3.07],
                         [5.0, -2.0, 1.0]])
    edge = rel_odom.copy()
    edge[0, 2] += np.radians(4.27)              # wrong-basin refinement
    edge[1, 2] += np.radians(0.9)               # plausible odometry drift
    edge[2, :2] += [0.5, -0.3]                  # small translation slack
    span = np.array([900.0, 900.0, 120.0])
    ok = odom_consistency_gate(lcfg, edge, rel_odom, span)
    assert list(ok) == [False, True, True]

    # translation limb: gross offset beyond base + pct * span
    edge2 = rel_odom.copy()
    edge2[2, :2] += [8.0, 0.0]                  # 8 m over a 120 m span
    ok2 = odom_consistency_gate(lcfg, edge2, rel_odom, span)
    assert not ok2[2]

    # disabled gate accepts everything
    import dataclasses
    off = dataclasses.replace(lcfg, loop_odom_gate=False)
    assert odom_consistency_gate(off, edge, rel_odom, span).all()
