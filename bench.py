"""Benchmark: single-chip radar SLAM front-end throughput.

Runs the full odometry front end (preprocess -> scan NDT -> sliding-window
Barron-GNC registration -> submap merge/keyframing) over a synthetic
Oxford-scale sequence on the real TPU chip via ``lax.scan`` and reports
frames/s.

Baseline: the reference (CPU C++/Ceres, ROS) publishes no FPS numbers in-repo
(BASELINE.md); its design constraint is the Navtech radar's 4 Hz frame rate
(real-time operation, README.md:9-19).  ``vs_baseline`` is therefore measured
against 4 frames/s — the rate the reference must sustain.
"""

import json
import time

import numpy as np


def build_config():
    from randt_slam_tpu.config import (
        CapacityConfig, MapConfig, MatcherConfig, PreprocessorConfig,
        SlamConfig, derive,
    )

    # Oxford-scale: 400x400 cells at 3.5 m, 100 m range, smoothing window 3.
    cfg = SlamConfig(
        ndt_map=MapConfig(size_x=1400, size_y=1400, resolution=3.5,
                          min_points_per_cell=10,
                          max_neighbour_linf_distance=10.0),
        preprocessor=PreprocessorConfig(min_range=2.0, max_range=100.0,
                                        min_intensity=60.0,
                                        beam_distance_increment_threshold=1.0),
        matcher=MatcherConfig(smoothing_steps=3, gnc_steps=2,
                              lm_max_iterations=12),
        capacity=CapacityConfig(max_scan_cells=512, max_submap_cells=4096,
                                max_submaps=16),
    )
    return derive(cfg)


def main():
    import jax
    import jax.numpy as jnp

    from randt_slam_tpu.io import synthetic
    from randt_slam_tpu.pipeline import frontend as F
    from randt_slam_tpu.pipeline import slam

    cfg = build_config()
    T = 40
    seq = synthetic.generate(
        seed=0, n_frames=T, n_azimuths=400, n_bins=512, max_range=100.0,
        speed=4.0, dt=0.25, n_walls=120,
    )
    frames = slam.frames_from_arrays(
        seq.intensity, seq.azimuths, seq.ranges, seq.stamps
    )
    s2b = jnp.zeros(3)

    def scan_body(c, fr):
        return F.frontend_step(cfg, c, fr, s2b)

    scan_fn = jax.jit(lambda c, fs: jax.lax.scan(scan_body, c, fs))

    carry0 = F.init_carry(cfg)
    # compile + warmup
    carry, outs = scan_fn(carry0, frames)
    jax.block_until_ready(outs.odom_pose)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        carry, outs = scan_fn(carry0, frames)
        jax.block_until_ready(outs.odom_pose)
        times.append(time.perf_counter() - t0)
    best = min(times)
    fps = T / best

    print(json.dumps({
        "metric": "radar_frames_per_second_1chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 4.0, 2),
    }))


if __name__ == "__main__":
    main()
