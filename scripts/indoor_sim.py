"""Indoor acceptance run: Zenodo-shaped rosbag -> full pipeline, IMU on.

The reference's primary benchmark (IROS paper, ``/root/reference/README.md:5``)
is the Zenodo indoor/mixed dataset, consumed as ROS1 bags of
``sensor_msgs/PointCloud2`` + ``sensor_msgs/Imu`` with the layered
``ndt_radar_slam_base_parameters.yaml`` + ``parameters_indoor.yaml`` config
(``ndt_slam.launch:7-8``, ``use_imu: true``).  The raw bags are not fetchable
here (zero egress), so this driver exercises BASELINE configs 1-2 the same way
``oxford_sim`` handles config 3: real pipeline, real config, simulated sensor.

  1. simulate an indoor route (two laps around a room block, ~0.8 m/s) in a
     wall-dense world, render 12 m-range polar scans (bin width 0.03 m — the
     indoor ``beam_distance_increment_threshold: 0.04`` demands bins finer
     than 4 cm), and synthesize a biased+noisy IMU,
  2. pack every frame into a REAL rosbag v2.0 (PointCloud2 on
     ``/radar_2/spectrum/pcl2``, Imu on ``/imu/transformed/data`` — the base
     config's topics) and re-ingest it through ``io/rosbag.convert_bag``:
     the pipeline consumes the BAG's data, not the simulator's arrays,
  3. run full SLAM configured from the reference's own layered YAMLs with
     ``use_imu: true`` (IMU factor fed by the ingested yaw),
  4. score with the validated kitti_eval protocol.

Usage:
    python scripts/indoor_sim.py --frames 800 --output /tmp/indoor_sim
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_CFG_DIR = "/root/reference/ros/ndt_radar_slam/config"
BASE_YAML = os.path.join(REF_CFG_DIR, "ndt_radar_slam_base_parameters.yaml")
INDOOR_YAML = os.path.join(REF_CFG_DIR, "parameters_indoor.yaml")

N_AZIMUTHS = 400
MAX_RANGE = 12.0           # parameters_indoor.yaml radar_preprocessor
BIN_WIDTH = 0.03           # < beam_distance_increment_threshold (0.04 m)
DT = 0.25
SPEED = 0.8                # indoor robot pace
IMU_BIAS = 0.002           # rad/s gyro-integration drift
IMU_NOISE = 0.004


def build_route(rng, frames: int):
    """Two laps around a rectangular room block (same-lane revisits)."""
    # rounded-rectangle racetrack: half-lengths picked so one lap is
    # ~frames/2 steps at SPEED*DT per step
    step = SPEED * DT
    lap_len = frames / 2 * step
    a = lap_len / (16 + 2 * np.pi)     # corner radius (perimeter = lap_len)
    hx, hy = 3 * a, a                   # straight half-lengths
    per = []
    s = np.linspace(0, lap_len, int(frames / 2), endpoint=False)
    # parameterize the rounded rectangle by arc length
    seg = [2 * hx, np.pi * a / 2, 2 * hy, np.pi * a / 2,
           2 * hx, np.pi * a / 2, 2 * hy, np.pi * a / 2]
    cum = np.concatenate([[0], np.cumsum(seg)])
    total = cum[-1]
    for si in s * (total / lap_len):
        k = np.searchsorted(cum, si, side="right") - 1
        t = si - cum[k]
        if k == 0:
            p = (-hx + t, -hy - a, 0.0)
        elif k == 1:
            th = t / a
            p = (hx + a * np.sin(th), -hy - a * np.cos(th), th)
        elif k == 2:
            p = (hx + a, -hy + t, np.pi / 2)
        elif k == 3:
            th = t / a
            p = (hx + a * np.cos(th), hy + a * np.sin(th), np.pi / 2 + th)
        elif k == 4:
            p = (hx - t, hy + a, np.pi)
        elif k == 5:
            th = t / a
            p = (-hx - a * np.sin(th), hy + a * np.cos(th), np.pi + th)
        elif k == 6:
            p = (-hx - a, hy - t, -np.pi / 2)
        else:
            th = t / a
            p = (-hx - a * np.cos(th), -hy - a * np.sin(th),
                 -np.pi / 2 + th)
        per.append(p)
    one = np.asarray(per, np.float32)
    route = np.concatenate([one, one])[:frames]
    route[:, 2] = np.arctan2(np.sin(route[:, 2]), np.cos(route[:, 2]))
    return route


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=800)
    ap.add_argument("--output", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=200)
    args = ap.parse_args(argv)
    os.makedirs(args.output, exist_ok=True)

    from randt_slam_tpu.config import CapacityConfig, from_reference_yaml
    from randt_slam_tpu.io import formats
    from randt_slam_tpu.io import kitti_eval as KE
    from randt_slam_tpu.io import oxford
    from randt_slam_tpu.io import rosbag as RB
    from randt_slam_tpu.io import synthetic as S
    from randt_slam_tpu.pipeline import slam

    rng = np.random.default_rng(args.seed)
    gt = build_route(rng, args.frames)
    landmarks = S.make_world(
        rng, trajectory=gt, n_walls=int(40 + args.frames / 10),
        corridor=9.0, n_clutter=args.frames // 5, min_refl=40.0,
        max_refl=120.0, wall_point_spacing=0.15)
    print(f"route "
          f"{np.linalg.norm(np.diff(gt[:, :2], axis=0), axis=1).sum():.0f} m,"
          f" {len(landmarks)} scatterers")

    azimuths = (np.arange(N_AZIMUTHS) / N_AZIMUTHS * 2 * np.pi - np.pi
                ).astype(np.float32)
    n_bins = int(MAX_RANGE / BIN_WIDTH)
    ranges = ((np.arange(n_bins) + 0.5) * BIN_WIDTH).astype(np.float32)
    stamps = 100.0 + np.arange(args.frames) * DT
    imu_yaw = (gt[:, 2] + IMU_BIAS * (stamps - stamps[0])
               + rng.normal(0, IMU_NOISE, args.frames))

    # ---- render + pack into a real rosbag --------------------------------
    t0 = time.perf_counter()
    msgs = []
    for t in range(args.frames):
        img = S.render_scan_fast(gt[t], landmarks, azimuths, ranges, rng,
                                 speckle=2.0)
        a_idx, r_idx = np.nonzero(img > 6.0)   # indoor min_intensity
        pts = np.stack([ranges[r_idx] * np.cos(azimuths[a_idx]),
                        ranges[r_idx] * np.sin(azimuths[a_idx]),
                        img[a_idx, r_idx]], axis=1)
        st = float(stamps[t])
        msgs.append(("/radar_2/spectrum/pcl2", "sensor_msgs/PointCloud2",
                     st, RB.serialize_pointcloud2(pts, st)))
        msgs.append(("/imu/transformed/data", "sensor_msgs/Imu", st,
                     RB.serialize_imu(float(imu_yaw[t]), st)))
    bag = os.path.join(args.output, "indoor_sim.bag")
    RB.write_bag(bag, msgs)
    print(f"bag: {os.path.getsize(bag) / 1e6:.1f} MB, "
          f"{time.perf_counter() - t0:.0f} s to build")

    # ---- ingest the bag (the pipeline sees only this) ---------------------
    npz = os.path.join(args.output, "indoor_sim.npz")
    info = RB.convert_bag(bag, npz, n_azimuths=N_AZIMUTHS, n_bins=n_bins,
                          max_range=MAX_RANGE)
    print("converted:", json.dumps(info))
    seq = oxford.load_npz_sequence(npz)
    assert seq.imu_yaw is not None, "IMU must come from the bag"

    cap = CapacityConfig(
        max_points=8192, max_scan_cells=512, max_azimuths=N_AZIMUTHS,
        max_range_bins=n_bins, max_submap_cells=4096, max_submaps=16,
        max_nodes=1024, max_edges=2048, max_keyframes=1024)
    cfg = from_reference_yaml(BASE_YAML, INDOOR_YAML, capacity=cap)
    assert cfg.use_imu and cfg.matcher.use_imu

    frames = slam.frames_from_arrays(seq.intensity, seq.azimuths, seq.ranges,
                                     seq.stamps, imu_yaw=seq.imu_yaw)
    t0 = time.perf_counter()
    res = slam.run_slam(cfg, frames, chunk=args.chunk)
    wall = time.perf_counter() - t0

    odo = res.odometry
    ev_odom = KE.evaluate(KE.poses_from_se2(gt),
                          KE.poses_from_se2(odo.odom_poses))
    ev_slam = KE.evaluate(KE.poses_from_se2(gt[res.node_frame]),
                          KE.poses_from_se2(res.node_pose_optimized))
    metrics = {
        "config": "ndt_radar_slam_base_parameters.yaml + parameters_indoor.yaml",
        "frames": int(args.frames),
        "wall_s": round(wall, 1),
        "use_imu": True,
        "imu_source": "rosbag",
        "n_nodes": int(len(res.node_pose_optimized)),
        "n_loop_closures": int(res.loops.n_accepted),
        "rejected_frames": int(np.asarray(odo.rejected_frames).sum()),
        "odom": {k: round(v, 5) for k, v in ev_odom.items()},
        "slam": {k: round(v, 5) for k, v in ev_slam.items()},
        "timings": res.timings,
        "saturation": odo.saturation,
    }
    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    formats.write_kitti(os.path.join(args.output, "odom_kitti.txt"),
                        odo.odom_poses)
    formats.write_kitti(os.path.join(args.output, "slam_kitti.txt"),
                        res.node_pose_optimized)
    formats.write_kitti(os.path.join(args.output, "gt_kitti.txt"), gt)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
