import numpy as np
import jax.numpy as jnp

from randt_slam_tpu import preprocess as pp
from randt_slam_tpu.config import PreprocessorConfig, MapConfig, SlamConfig, derive


def make_cfg(thresh=1.5):
    # The tests use 1 m range bins, so the contiguity threshold must exceed
    # the bin width for the inward expansion to proceed (see the signed
    # range check, ``radar_preprocessor.cpp:84``).
    cfg = SlamConfig(
        preprocessor=PreprocessorConfig(
            min_range=2.0, max_range=50.0, min_intensity=20.0,
            beam_distance_increment_threshold=thresh,
        ),
        ndt_map=MapConfig(size_x=100, size_y=100, resolution=2.0),
    )
    return derive(cfg).preprocessor


def test_filter_scan_finds_peak_run():
    cfg = make_cfg()
    A, R = 8, 64
    ranges = (np.arange(R) + 0.5).astype(np.float32)  # 1 m bins
    img = np.zeros((A, R), np.float32)
    # Azimuth 0: clean triangular blob peaked at bin 20 (range 20.5).
    img[0, 17:24] = [30, 60, 90, 120, 80, 50, 25]
    # Azimuth 1: all below min intensity -> masked points but peak exists.
    img[1, 30] = 15.0
    # Azimuth 2: nothing.
    scan = pp.PolarScan(
        intensity=jnp.asarray(img),
        azimuths=jnp.asarray(np.linspace(-np.pi, np.pi, A, endpoint=False, dtype=np.float32)),
        ranges=jnp.asarray(ranges),
        azimuth_mask=jnp.ones(A, bool),
    )
    out = pp.filter_scan(scan, cfg, jnp.zeros(3), run_window=8)
    W = 17
    mask = np.asarray(out.mask).reshape(A, W)
    pts = np.asarray(out.points).reshape(A, W, 3)
    polar = np.asarray(out.polar).reshape(A, W, 2)
    # Azimuth 0: the whole decreasing run around the peak above min intensity.
    kept_ranges = sorted(polar[0][mask[0]][:, 1].tolist())
    assert kept_ranges == [17.5, 18.5, 19.5, 20.5, 21.5, 22.5, 23.5]
    # Peak beam record.
    beams = np.asarray(out.beams)
    assert np.isclose(beams[0, 1], 20.5) and np.isclose(beams[0, 2], 120.0)
    assert bool(np.asarray(out.beam_mask)[0])
    # Azimuth 1: peak below min_intensity -> no kept points, but beam valid.
    assert mask[1].sum() == 0
    assert bool(np.asarray(out.beam_mask)[1])
    # Azimuth 2: nothing at all.
    assert mask[2].sum() == 0
    assert not bool(np.asarray(out.beam_mask)[2])
    # Intensity values of kept points match the image.
    np.testing.assert_allclose(
        sorted(pts[0][mask[0]][:, 2].tolist()), [25, 30, 50, 60, 80, 90, 120]
    )


def test_signed_contiguity_blocks_inward_expansion_only():
    # With a threshold below the bin width the reference's signed range check
    # stops the closer-to-sensor expansion immediately but never the outward
    # one (``radar_preprocessor.cpp:84,99``).
    cfg = make_cfg(thresh=0.12)
    A, R = 2, 64
    ranges = (np.arange(R) + 0.5).astype(np.float32)
    img = np.zeros((A, R), np.float32)
    img[0, 17:24] = [30, 60, 90, 120, 80, 50, 25]
    scan = pp.PolarScan(
        intensity=jnp.asarray(img),
        azimuths=jnp.zeros(A, jnp.float32),
        ranges=jnp.asarray(ranges),
        azimuth_mask=jnp.ones(A, bool),
    )
    out = pp.filter_scan(scan, cfg, jnp.zeros(3), run_window=8)
    W = 17
    mask = np.asarray(out.mask).reshape(A, W)
    polar = np.asarray(out.polar).reshape(A, W, 2)
    kept = sorted(polar[0][mask[0]][:, 1].tolist())
    assert kept == [20.5, 21.5, 22.5, 23.5]


def test_filter_scan_respects_range_gates():
    cfg = make_cfg()
    A, R = 4, 64
    ranges = (np.arange(R) + 0.5).astype(np.float32)
    img = np.zeros((A, R), np.float32)
    img[0, 0] = 200.0   # below min_range (0.5 m)
    img[0, 60] = 90.0   # above max_range? 60.5 > 50 -> excluded from peak
    img[1, 10:13] = [50, 100, 40]
    scan = pp.PolarScan(
        intensity=jnp.asarray(img),
        azimuths=jnp.zeros(A, jnp.float32),
        ranges=jnp.asarray(ranges),
        azimuth_mask=jnp.ones(A, bool),
    )
    out = pp.filter_scan(scan, cfg, jnp.zeros(3), run_window=4)
    W = 9
    mask = np.asarray(out.mask).reshape(A, W)
    assert mask[0].sum() == 0  # nothing in valid range window
    polar = np.asarray(out.polar).reshape(A, W, 2)
    kept = sorted(polar[1][mask[1]][:, 1].tolist())
    assert kept == [10.5, 11.5, 12.5]


def test_filter_scan_base_frame_transform():
    cfg = make_cfg()
    A, R = 4, 32
    ranges = (np.arange(R) + 0.5).astype(np.float32)
    img = np.zeros((A, R), np.float32)
    img[0, 10] = 100.0
    azims = np.zeros(A, np.float32)  # beam along +x
    scan = pp.PolarScan(
        intensity=jnp.asarray(img),
        azimuths=jnp.asarray(azims),
        ranges=jnp.asarray(ranges),
        azimuth_mask=jnp.ones(A, bool),
    )
    sensor_to_base = jnp.asarray([1.0, 0.0, np.pi / 2], jnp.float32)
    out = pp.filter_scan(scan, cfg, sensor_to_base, run_window=4)
    pts = np.asarray(out.points)[np.asarray(out.mask)]
    # sensor-frame point (10.5, 0) -> base frame (1, 10.5)
    np.testing.assert_allclose(pts[0, :2], [1.0, 10.5], atol=1e-4)


def test_cluster_ids_grid_hash():
    cfg = make_cfg()  # max_range 50, map res 2 -> row_size 50, cluster res 2
    pts = jnp.asarray(
        [[0.5, 0.5, 10.0], [1.5, 0.5, 10.0], [2.5, 0.5, 10.0], [-49.0, -49.0, 1.0]]
    )
    ids, num = pp.cluster_ids(pts, jnp.ones(4, bool), cfg)
    ids = np.asarray(ids)
    assert num == cfg.cluster_row_size**2
    assert ids[0] == ids[1]        # same 2 m cell
    assert ids[0] != ids[2]        # next cell over
    assert ids[3] == 0             # corner cell
    # masked points get the drop id
    ids2, _ = pp.cluster_ids(pts, jnp.zeros(4, bool), cfg)
    assert np.all(np.asarray(ids2) == num)
