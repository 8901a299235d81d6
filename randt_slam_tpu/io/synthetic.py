"""Synthetic radar world generator for tests and benchmarks.

No radar datasets ship with this repository (the reference evaluates against
external rosbags, SURVEY.md §4/§6), so correctness and performance are
validated closed-loop: simulate a 2-D world of point scatterers, sweep a
simulated FMCW-style radar along a ground-truth trajectory, run SLAM on the
rendered polar intensity images, and compare the estimate against the known
trajectory (ATE/RPE, ``io/formats.py``).

The scan model mirrors what the reference's preprocessor expects
(``radar_preprocessor.cpp:45-125``): each scatterer produces an intensity blob
that decays over a few range bins away from its true range, on top of low
speckle noise, so the per-azimuth peak filter reconstructs the scatterer
positions.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class SyntheticSequence(NamedTuple):
    intensity: np.ndarray   # (T, A, R) float32 polar scans
    azimuths: np.ndarray    # (A,) beam angles
    ranges: np.ndarray      # (R,) bin centers [m]
    stamps: np.ndarray      # (T,) seconds
    gt_poses: np.ndarray    # (T, 3) ground-truth sensor poses (world frame)
    imu_yaw: np.ndarray     # (T,) absolute yaw readings (noisy, biased)
    landmarks: np.ndarray   # (L, 3) world scatterers [x, y, reflectivity]


def make_world(rng, n_landmarks=400, extent=220.0, min_refl=90.0, max_refl=180.0):
    pts = rng.uniform(-extent, extent, (n_landmarks, 2))
    refl = rng.uniform(min_refl, max_refl, (n_landmarks, 1))
    return np.concatenate([pts, refl], axis=1).astype(np.float32)


def make_trajectory(rng, n_frames, dt=0.25, speed=4.0, yaw_rate_scale=0.15,
                    loop=False):
    """Smooth random drive; ``loop=True`` closes back near the start."""
    if loop:
        # Circle with perturbations: guarantees revisiting the start area.
        total = n_frames * dt
        omega = 2.0 * np.pi / total
        yaw_rates = omega + rng.normal(0, 0.01, n_frames)
    else:
        yaw_rates = np.zeros(n_frames)
        w = 0.0
        for i in range(n_frames):
            w = 0.9 * w + rng.normal(0, yaw_rate_scale)
            yaw_rates[i] = w
    poses = np.zeros((n_frames, 3))
    th, x, y = 0.0, 0.0, 0.0
    for i in range(1, n_frames):
        th = th + yaw_rates[i] * dt
        x += speed * dt * np.cos(th)
        y += speed * dt * np.sin(th)
        poses[i] = (x, y, np.arctan2(np.sin(th), np.cos(th)))
    return poses.astype(np.float32)


def render_scan(pose, landmarks, azimuths, ranges, rng,
                blob_sigma_bins=1.5, speckle=8.0, beamwidth=None):
    """Render one polar intensity image from a sensor pose."""
    A, R = len(azimuths), len(ranges)
    bin_width = float(ranges[1] - ranges[0])
    if beamwidth is None:
        beamwidth = 2.0 * np.pi / A
    c, s = np.cos(pose[2]), np.sin(pose[2])
    rel = landmarks[:, :2] - pose[:2]
    lx = c * rel[:, 0] + s * rel[:, 1]
    ly = -s * rel[:, 0] + c * rel[:, 1]
    rr = np.hypot(lx, ly)
    aa = np.arctan2(ly, lx)
    img = rng.rayleigh(speckle, (A, R)).astype(np.float32)

    vis = (rr > ranges[0]) & (rr < ranges[-1])
    az_idx = np.round((aa - azimuths[0]) / (azimuths[1] - azimuths[0])).astype(int) % A
    r_idx = (rr - ranges[0]) / bin_width
    for k in np.nonzero(vis)[0]:
        a0 = az_idx[k]
        rc = r_idx[k]
        lo = max(0, int(rc - 4))
        hi = min(R, int(rc + 5))
        bins = np.arange(lo, hi)
        prof = landmarks[k, 2] * np.exp(-0.5 * ((bins - rc) / blob_sigma_bins) ** 2)
        img[a0, lo:hi] = np.maximum(img[a0, lo:hi], prof)
    return img


def generate(
    seed=0,
    n_frames=60,
    n_azimuths=128,
    n_bins=256,
    max_range=100.0,
    dt=0.25,
    speed=4.0,
    loop=False,
    n_landmarks=400,
    imu_bias=0.01,
    imu_noise=0.002,
) -> SyntheticSequence:
    rng = np.random.default_rng(seed)
    landmarks = make_world(rng, n_landmarks=n_landmarks, extent=max_range * 1.6)
    poses = make_trajectory(rng, n_frames, dt=dt, speed=speed, loop=loop)
    azimuths = (np.arange(n_azimuths) / n_azimuths * 2.0 * np.pi - np.pi).astype(
        np.float32
    )
    ranges = (np.arange(n_bins) + 0.5) * (max_range / n_bins)
    ranges = ranges.astype(np.float32)
    scans = np.stack(
        [render_scan(p, landmarks, azimuths, ranges, rng) for p in poses]
    )
    stamps = (np.arange(n_frames) * dt).astype(np.float32)
    imu_yaw = poses[:, 2] + imu_bias * stamps + rng.normal(0, imu_noise, n_frames)
    return SyntheticSequence(
        intensity=scans.astype(np.float32),
        azimuths=azimuths,
        ranges=ranges,
        stamps=stamps,
        gt_poses=poses,
        imu_yaw=imu_yaw.astype(np.float32),
        landmarks=landmarks,
    )
