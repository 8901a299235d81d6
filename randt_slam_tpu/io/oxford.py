"""Oxford Radar RobotCar ingestion.

The reference consumes Oxford sequences converted to rosbags of point clouds
(``oxford-dataset.md``), but the raw dataset ships radar frames as polar
intensity PNGs — exactly the ``PolarScan`` format this engine's preprocessor
consumes natively, so no point-cloud detour is needed.

Raw frame layout (per the dataset SDK): one PNG per scan, 400 rows
(azimuths) x (11 + 3768) columns of uint8; the first 11 bytes per row encode
the UNIX timestamp (8), sweep counter (2), and valid flag (1); the remaining
3768 bytes are power returns at 4.32 cm bins.  Intensities are rescaled to
[0, 255] * 0.5 ... the reference's converter feeds intensity in [0, 255]-ish
units; ``min_intensity: 70`` of ``parameters_oxford.yaml`` implies raw power
units, so we export ``uint8 * 1.0``.

Also reads converted ``.npz`` sequences (keys: intensity (T, A, R) float16/32,
azimuths (A,), ranges (R,), stamps (T,), optional gt_poses (T, 3)).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np

OXFORD_N_AZIMUTHS = 400
OXFORD_N_BINS = 3768
OXFORD_BIN_WIDTH = 0.0432  # meters
OXFORD_HEADER_BYTES = 11


class RadarSequence(NamedTuple):
    intensity: np.ndarray  # (T, A, R) float32
    azimuths: np.ndarray   # (A,)
    ranges: np.ndarray     # (R,)
    stamps: np.ndarray     # (T,) seconds (re-based to 0)
    gt_poses: np.ndarray | None


def decode_radar_png(data: np.ndarray, downsample_bins: int = 1):
    """Decode one raw Oxford radar frame already loaded as a (400, 3779)
    uint8 array (PNG decoding itself is the caller's concern; PIL/cv2 both
    work).  Returns (intensity (400, R), azimuths (400,), timestamps (400,))."""
    assert data.shape[0] == OXFORD_N_AZIMUTHS
    header = data[:, :OXFORD_HEADER_BYTES]
    power = data[:, OXFORD_HEADER_BYTES:].astype(np.float32)
    stamps = header[:, :8].copy().view(np.int64).reshape(-1) * 1e-6
    sweep = header[:, 8:10].copy().view(np.uint16).reshape(-1)
    azimuths = sweep.astype(np.float32) / 2800.0 * np.pi - np.pi
    if downsample_bins > 1:
        R = power.shape[1] // downsample_bins * downsample_bins
        power = power[:, :R].reshape(
            OXFORD_N_AZIMUTHS, -1, downsample_bins
        ).max(axis=2)
    return power, azimuths, stamps


def load_npz_sequence(path: str, max_frames: int | None = None) -> RadarSequence:
    """Load a converted sequence (our canonical interchange format)."""
    data = np.load(path)
    T = data["intensity"].shape[0]
    if max_frames is not None:
        T = min(T, max_frames)
    stamps = np.asarray(data["stamps"][:T], np.float64)
    stamps = (stamps - stamps[0]).astype(np.float32)
    return RadarSequence(
        intensity=np.asarray(data["intensity"][:T], np.float32),
        azimuths=np.asarray(data["azimuths"], np.float32),
        ranges=np.asarray(data["ranges"], np.float32),
        stamps=stamps,
        gt_poses=np.asarray(data["gt_poses"][:T], np.float32)
        if "gt_poses" in data else None,
    )


def load_png_directory(radar_dir: str, max_frames: int | None = None,
                       downsample_bins: int = 4) -> RadarSequence:
    """Load a raw Oxford ``radar/`` directory of per-frame PNGs (requires
    PIL).  Range bins are max-pooled by ``downsample_bins`` (4 -> 17.3 cm
    bins, still far below the 3.5 m NDT resolution)."""
    from PIL import Image  # noqa: deferred; optional dependency

    files = sorted(
        f for f in os.listdir(radar_dir) if f.endswith(".png")
    )
    if max_frames is not None:
        files = files[:max_frames]
    frames, stamps = [], []
    azimuths = None
    for f in files:
        arr = np.asarray(Image.open(os.path.join(radar_dir, f)))
        power, az, ts = decode_radar_png(arr, downsample_bins)
        frames.append(power)
        stamps.append(ts.mean())
        azimuths = az
    ranges = (
        (np.arange(frames[0].shape[1]) + 0.5)
        * OXFORD_BIN_WIDTH * downsample_bins
    ).astype(np.float32)
    stamps = np.asarray(stamps, np.float64)
    return RadarSequence(
        intensity=np.stack(frames),
        azimuths=azimuths.astype(np.float32),
        ranges=ranges,
        stamps=(stamps - stamps[0]).astype(np.float32),
        gt_poses=None,
    )
