"""Oxford ingestion: GT odometry composition, PNG decoding, npz round-trip."""

import numpy as np

from randt_slam_tpu.io import oxford


def test_gt_radar_odometry_composition(tmp_path):
    """Relative-motion rows compose into the correct absolute trajectory."""
    rng = np.random.default_rng(0)
    T = 50
    rel = np.zeros((T - 1, 3))
    rel[:, 0] = rng.uniform(0.5, 1.5, T - 1)       # forward motion
    rel[:, 1] = rng.normal(0, 0.05, T - 1)
    rel[:, 2] = rng.normal(0, 0.05, T - 1)         # yaw increments
    # expected absolute poses
    want = np.zeros((T, 3))
    for k in range(T - 1):
        x, y, th = want[k]
        c, s = np.cos(th), np.sin(th)
        want[k + 1] = [x + c * rel[k, 0] - s * rel[k, 1],
                       y + s * rel[k, 0] + c * rel[k, 1],
                       np.arctan2(np.sin(th + rel[k, 2]),
                                  np.cos(th + rel[k, 2]))]
    stamps_us = 1547120000000000 + np.arange(T - 1) * 250000
    csv = tmp_path / "radar_odometry.csv"
    header = ("source_timestamp,destination_timestamp,x,y,z,roll,pitch,yaw,"
              "source_radar_timestamp,destination_radar_timestamp\n")
    with open(csv, "w") as f:
        f.write(header)
        for k in range(T - 1):
            f.write(f"{stamps_us[k]},{stamps_us[k]+250000},"
                    f"{rel[k,0]},{rel[k,1]},0.0,0.0,0.0,{rel[k,2]},"
                    f"{stamps_us[k]},{stamps_us[k]+250000}\n")
    stamps, poses = oxford.load_gt_radar_odometry(str(csv))
    assert poses.shape == (T, 3)
    np.testing.assert_allclose(poses, want, atol=1e-4)
    np.testing.assert_allclose(np.diff(stamps), 0.25, atol=1e-6)


def test_decode_radar_png_layout():
    """Header bytes (stamp, sweep counter) and power bins decode per the
    dataset SDK layout; max-pool downsampling preserves peaks."""
    A, R = oxford.OXFORD_N_AZIMUTHS, oxford.OXFORD_N_BINS
    raw = np.zeros((A, oxford.OXFORD_HEADER_BYTES + R), np.uint8)
    stamp_us = np.int64(1547120000123456)
    sweep = (np.arange(A) * (5600 // A)).astype(np.uint16)
    raw[:, :8] = np.frombuffer(
        np.full(A, stamp_us, np.int64).tobytes(), np.uint8).reshape(A, 8)
    raw[:, 8:10] = np.frombuffer(sweep.tobytes(), np.uint8).reshape(A, 2)
    raw[5, oxford.OXFORD_HEADER_BYTES + 100] = 200  # one bright return
    power, az, ts = oxford.decode_radar_png(raw, downsample_bins=4)
    assert power.shape == (A, R // 4)
    assert power[5, 25] == 200.0  # max-pool keeps the peak
    np.testing.assert_allclose(ts, stamp_us * 1e-6)
    assert az.min() >= -np.pi and az.max() <= np.pi
    np.testing.assert_allclose(np.diff(az)[:A - 1],
                               (5600 // A) / 2800.0 * np.pi, atol=1e-6)


def test_npz_roundtrip_with_gt_and_imu(tmp_path):
    T, A, R = 4, 8, 16
    path = tmp_path / "seq.npz"
    np.savez(path,
             intensity=np.random.rand(T, A, R).astype(np.float16),
             azimuths=np.linspace(-np.pi, np.pi, A, endpoint=False),
             ranges=np.arange(R) * 0.5 + 0.25,
             stamps=np.arange(T) * 0.25 + 100.0,
             gt_poses=np.zeros((T, 3), np.float32),
             imu_yaw=np.full(T, 0.1, np.float32))
    seq = oxford.load_npz_sequence(str(path))
    assert seq.intensity.shape == (T, A, R)
    assert seq.stamps[0] == 0.0  # re-based
    assert seq.gt_poses is not None and seq.imu_yaw is not None
    np.testing.assert_allclose(seq.imu_yaw, 0.1)
