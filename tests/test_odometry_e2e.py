"""End-to-end odometry on a synthetic world: the minimum end-to-end slice
(SURVEY.md §7.2 M2/M3).  A simulated radar drives through a landmark field;
the front end must track the ground-truth trajectory."""

import numpy as np
import jax.numpy as jnp
import pytest

from randt_slam_tpu.config import (
    SlamConfig, MapConfig, MatcherConfig, PreprocessorConfig, CapacityConfig,
    LocalFuserConfig, derive,
)
from randt_slam_tpu.io import synthetic, formats
from randt_slam_tpu.pipeline import slam


def small_cfg():
    from randt_slam_tpu.config import synthetic_config

    return synthetic_config()


@pytest.fixture(scope="module")
def seq():
    return synthetic.generate(seed=3, n_frames=46, n_azimuths=256, n_bins=256,
                              speed=4.0, dt=0.25)


@pytest.fixture(scope="module")
def result(seq):
    cfg = small_cfg()
    frames = slam.frames_from_arrays(
        seq.intensity, seq.azimuths, seq.ranges, seq.stamps
    )
    return slam.run_odometry(cfg, frames, use_scan=True)


def test_odometry_tracks_ground_truth(seq, result):
    est = result.odom_poses
    assert est.shape == (46, 3)
    err_ate = formats.ate(est, seq.gt_poses, align=True)
    # ~4 m/frame motion over 46 frames, several hundred meters travelled;
    # odometry should stay within a couple of meters RMS.
    assert err_ate < 2.0, f"odometry ATE too high: {err_ate}"
    t_rpe, r_rpe = formats.rpe(est, seq.gt_poses)
    assert t_rpe < 0.25, f"RPE trans too high: {t_rpe}"
    assert r_rpe < 1.5, f"RPE rot too high: {r_rpe}"


def test_float16_scans_match_float32(seq, result):
    """float16 host scans (halved upload for long sequences) must produce
    the same trajectory as float32 input — the front end upcasts on device,
    and f16 quantization is far below the speckle noise floor."""
    cfg = small_cfg()
    frames16 = slam.frames_from_arrays(
        seq.intensity.astype(np.float16), seq.azimuths, seq.ranges,
        seq.stamps, host=True,
    )
    assert np.asarray(frames16.intensity).dtype == np.float16
    odo16 = slam.run_odometry(cfg, frames16, use_scan=True)
    err = np.linalg.norm(
        odo16.odom_poses[:, :2] - result.odom_poses[:, :2], axis=1
    ).max()
    # f16 rounding can flip strictly-decreasing-run ties in the peak filter,
    # perturbing a few points per scan; centimeters over hundreds of meters.
    assert err < 0.15, f"f16 ingestion diverged from f32: {err}"


def test_node_edge_tables_consistent(result):
    n = len(result.node_id)
    assert n > 5
    assert np.array_equal(result.node_id, np.arange(n))
    # submaps: 46 frames -> boundary at frame 19 and 38 -> 3 submaps
    assert result.n_submaps == 3
    assert result.node_submap.max() == 2
    # root flags: one per submap
    assert result.node_is_root.sum() == 3
    # edges chain consecutive nodes
    assert np.array_equal(result.edge_begin, result.edge_end - 1)
    # edge transforms consistent with node poses
    for k in range(len(result.edge_begin)):
        a = result.node_pose[result.edge_begin[k]]
        b = result.node_pose[result.edge_end[k]]
        c, s = np.cos(a[2]), np.sin(a[2])
        rel = np.array(
            [c * (b[0] - a[0]) + s * (b[1] - a[1]),
             -s * (b[0] - a[0]) + c * (b[1] - a[1]),
             np.arctan2(np.sin(b[2] - a[2]), np.cos(b[2] - a[2]))]
        )
        np.testing.assert_allclose(result.edge_trans[k], rel, atol=1e-3)


def test_node_poses_match_odometry_at_frames(seq, result):
    # Node poses are smoothed; they should agree with the ground truth about
    # as well as the per-frame odometry does.
    node_gt = seq.gt_poses[result.node_frame]
    err = formats.ate(result.node_pose, node_gt, align=True)
    assert err < 2.0


def test_python_loop_matches_scan(seq):
    cfg = small_cfg()
    frames = slam.frames_from_arrays(
        seq.intensity[:24], seq.azimuths, seq.ranges, seq.stamps[:24]
    )
    r1 = slam.run_odometry(cfg, frames, use_scan=True)
    r2 = slam.run_odometry(cfg, frames, use_scan=False)
    np.testing.assert_allclose(r1.odom_poses, r2.odom_poses, atol=1e-4)
