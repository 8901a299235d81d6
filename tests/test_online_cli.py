"""Online (incremental) mode and the CLI driver.

Regression coverage for the early-database ScanContext kNN crash (top_k with
k > N) and smoke coverage of ``python -m randt_slam_tpu.run`` exports.
"""

import json
import os

import numpy as np
import jax
import pytest

from randt_slam_tpu.io import synthetic
from randt_slam_tpu.pipeline import slam
from __graft_entry__ import _tiny_cfg


@pytest.fixture(scope="module")
def tiny_seq():
    cfg = _tiny_cfg()
    seq = synthetic.generate(seed=5, n_frames=16, n_azimuths=64, n_bins=128,
                             max_range=40.0, speed=3.0, dt=0.25, n_walls=40)
    frames = slam.frames_from_arrays(
        seq.intensity, seq.azimuths, seq.ranges, seq.stamps
    )
    return cfg, seq, frames


def test_online_mode_runs_and_detects_early(tiny_seq):
    from randt_slam_tpu.pipeline.online import OnlineSlam

    cfg, seq, frames = tiny_seq
    # loop_every=2 forces detect_loops while the SC database is shorter than
    # num_candidates (the reference kd-tree tolerates this; top_k must too)
    eng = OnlineSlam(cfg, loop_every=2, pgo_every=6)
    for t in range(16):
        fr = jax.tree.map(lambda x: x[t], frames)
        pose = eng.process_frame(fr)
        assert np.all(np.isfinite(pose))
    assert len(eng.node_pose) >= 3
    traj = eng.trajectory()
    assert traj.shape[1] == 3 and np.all(np.isfinite(traj))
    # odometry should move roughly with the commanded speed
    assert np.linalg.norm(eng.odom_trace[-1][:2]) > 1.0


def test_cli_odometry_smoke(tmp_path, monkeypatch):
    from randt_slam_tpu import run as cli

    out = str(tmp_path / "out")
    # patch the synthetic preset to the tiny config so the smoke test stays
    # CPU-fast; frame shapes must match the capacities
    monkeypatch.setattr(cli, "load_config", lambda args: _tiny_cfg())
    monkeypatch.setattr(
        cli, "load_frames",
        lambda args, cfg: _tiny_frames(cfg, args.frames or 10),
    )
    cli.main(["--input", "synthetic", "--config", "synthetic",
              "--frames", "10", "--odometry-only", "--python-loop",
              "--output", out])
    metrics = json.load(open(os.path.join(out, "metrics.json")))
    assert metrics["frames"] == 10
    assert np.isfinite(metrics["odom_ate_m"])
    for f in ["odom_tum.txt", "odom_kitti.txt", "slam_tum.txt",
              "trajectory.json"]:
        assert os.path.exists(os.path.join(out, f)), f


def _tiny_frames(cfg, n):
    seq = synthetic.generate(seed=6, n_frames=n, n_azimuths=64, n_bins=128,
                             max_range=40.0, speed=3.0, dt=0.25, n_walls=40)
    frames = slam.frames_from_arrays(
        seq.intensity, seq.azimuths, seq.ranges, seq.stamps
    )
    return frames, seq.gt_poses, seq.stamps
