"""Benchmark: radar SLAM on the real TPU chip at real Oxford geometry.

Configuration comes from the reference's own ``parameters_oxford.yaml``
(114x114-cell NDT maps at 3.5 m) and the frames have the real converted
geometry (400 azimuths x 1157 range bins of 8.64 cm out to the 100 m config
range — what ``io/oxford.py`` produces from raw PNGs at downsample 2).  The
trajectory is a snippet of the REAL Oxford ground truth with a simulated
scatterer world (raw radar data is not fetchable in this environment; see
OXFORD_RESULTS.md).

Reported (one JSON line):
  * front-end frames/s over a lax.scan of the full odometry step (primary)
  * loop-closure phase seconds (batched ScanContext + GNC refine + CS gate)
  * pose-graph solve milliseconds at the real sequence's size (4077 nodes)

Baseline: the reference (CPU C++/Ceres) publishes no FPS numbers in-repo
(BASELINE.md); its hard constraint is the Navtech radar's 4 Hz frame rate.
``vs_baseline`` is measured against 4 frames/s.
"""

import json
import os
import time

import numpy as np

REF_YAML = "/root/reference/ros/ndt_radar_slam/config/parameters_oxford.yaml"
REF_GT = "/root/reference/oxford_results/randt_eval_10-12-32/odom/gt/01.txt"

N_AZ = 400
BIN_W = 0.0864
MAX_RANGE = 100.0
T = 160


def build_config():
    from randt_slam_tpu.config import from_reference_yaml, oxford_config

    if os.path.exists(REF_YAML):
        return from_reference_yaml(REF_YAML)
    return oxford_config()


def build_frames():
    from randt_slam_tpu.io import kitti_eval as KE
    from randt_slam_tpu.io import synthetic as S
    from randt_slam_tpu.pipeline import slam

    rng = np.random.default_rng(0)
    if os.path.exists(REF_GT):
        gt44 = KE.load_kitti_poses(REF_GT)[:T]
        gt = np.stack([gt44[:, 0, 3], gt44[:, 1, 3],
                       np.arctan2(gt44[:, 1, 0], gt44[:, 0, 0])], 1)
        gt = gt.astype(np.float32)
    else:
        gt = S.make_trajectory(rng, T, dt=0.25, speed=4.0)
    landmarks = S.make_world(rng, trajectory=gt, n_walls=120, corridor=50.0,
                             n_clutter=240)
    az = (np.arange(N_AZ) / N_AZ * 2 * np.pi - np.pi).astype(np.float32)
    n_bins = int(MAX_RANGE / BIN_W)
    ranges = ((np.arange(n_bins) + 0.5) * BIN_W).astype(np.float32)
    scans = np.stack([
        S.render_scan_fast(p, landmarks, az, ranges, rng) for p in gt
    ]).astype(np.float32)
    stamps = (np.arange(T) * 0.25).astype(np.float32)
    frames = slam.frames_from_arrays(scans, az, ranges, stamps)
    return frames, gt


def bench_pgo_ms(n_nodes=4077):
    """Pose-graph solve at the real Oxford sequence size (BASELINE.md row)."""
    import jax
    import jax.numpy as jnp

    from randt_slam_tpu.graph import pose_graph as PG
    from randt_slam_tpu.config import GlobalFuserConfig

    rng = np.random.default_rng(1)
    t = np.linspace(0, 4 * np.pi, n_nodes)
    gt = np.stack([60 * np.cos(t), 60 * np.sin(t), t + np.pi / 2], 1)
    noisy = gt + np.concatenate(
        [np.zeros((1, 3)), np.cumsum(rng.normal(0, 0.03, (n_nodes - 1, 3)), 0)]
    )
    eb = np.arange(n_nodes - 1)
    ee = eb + 1
    # relative gt transforms as edge measurements
    c = np.cos(gt[:-1, 2]); s = np.sin(gt[:-1, 2])
    d = gt[1:] - gt[:-1]
    trans = np.stack([c * d[:, 0] + s * d[:, 1],
                      -s * d[:, 0] + c * d[:, 1], d[:, 2]], 1)
    # loop edges every 100 nodes back to the matching lap position
    lap = n_nodes // 2
    lb = np.arange(lap, n_nodes - 1, 100)
    le = lb - lap
    eb = np.concatenate([eb, lb]); ee = np.concatenate([ee, le])
    trans = np.concatenate([trans, np.zeros((len(lb), 3))])
    sqrtI = np.tile(np.diag([10.0, 10.0, 50.0]), (len(eb), 1, 1))
    g = PG.PoseGraph(
        poses=jnp.asarray(noisy, jnp.float32),
        id_begin=jnp.asarray(eb, jnp.int32),
        id_end=jnp.asarray(ee, jnp.int32),
        trans=jnp.asarray(trans, jnp.float32),
        sqrt_information=jnp.asarray(sqrtI, jnp.float32),
        valid=jnp.ones(len(eb), bool),
    )
    cfg = GlobalFuserConfig()
    poses, info = PG.optimize(g, cfg)          # compile + solve
    jax.block_until_ready(poses)
    t0 = time.perf_counter()
    poses, info = PG.optimize(g, cfg)
    jax.block_until_ready(poses)
    return (time.perf_counter() - t0) * 1000.0, int(info["iterations"])


def main():
    import jax
    from functools import partial

    from randt_slam_tpu.pipeline import frontend as F
    from randt_slam_tpu.pipeline import slam
    from randt_slam_tpu.loops import detector

    cfg = build_config()
    frames, gt = build_frames()
    s2b = np.zeros(3, np.float32)

    import jax.numpy as jnp

    def scan_body(c, fr):
        return F.frontend_step(cfg, c, fr, jnp.zeros(3))

    scan_fn = jax.jit(lambda c, fs: jax.lax.scan(scan_body, c, fs))
    carry0 = F.init_carry(cfg)
    carry, outs = scan_fn(carry0, frames)      # compile + warmup
    jax.block_until_ready(outs.odom_pose)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        carry, outs = scan_fn(carry0, frames)
        jax.block_until_ready(outs.odom_pose)
        times.append(time.perf_counter() - t0)
    fps = T / min(times)

    # loop-closure + PGO phase timings on the produced graph
    odo = slam.run_odometry(cfg, frames)
    t0 = time.perf_counter()
    loops = detector.detect_loops(cfg, odo, frames, jnp.zeros(3))
    loop_s = time.perf_counter() - t0
    pgo_ms, pgo_iters = bench_pgo_ms()

    print(json.dumps({
        "metric": "radar_frames_per_second_1chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 4.0, 2),
        "extra": {
            "geometry": f"{N_AZ}x{int(MAX_RANGE / BIN_W)} bins, "
                        f"{cfg.ndt_map.size_x}^2-cell map (parameters_oxford.yaml)",
            "loop_closure_phase_s": round(loop_s, 3),
            "loop_candidates": int(loops.n_sc_candidates),
            "pose_graph_solve_ms_4077_nodes": round(pgo_ms, 1),
            "pose_graph_iterations": pgo_iters,
        },
    }))


if __name__ == "__main__":
    main()
