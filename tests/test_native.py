import numpy as np
import jax.numpy as jnp

from randt_slam_tpu.io import native
from randt_slam_tpu.mapping import raytrace


def test_native_library_builds():
    assert native.have_native(), "native library failed to build"


def test_pack_polar_image_roundtrip():
    A, R = 32, 64
    az0, daz = -np.pi, 2 * np.pi / A
    r0, dr = 0.0, 0.5
    # points exactly on beam 5 at ranges 3.25, 7.25 with intensities 80/120
    ang = az0 + 5 * daz
    pts = np.asarray(
        [
            [np.cos(ang) * 3.25, np.sin(ang) * 3.25, 80.0],
            [np.cos(ang) * 7.25, np.sin(ang) * 7.25, 120.0],
            [np.cos(ang) * 7.3, np.sin(ang) * 7.3, 60.0],  # same bin, lower
            [100.0, 0.0, 50.0],  # out of range -> dropped
        ],
        np.float32,
    )
    img = native.pack_polar_image(pts, az0, daz, A, r0, dr, R)
    assert img.shape == (A, R)
    assert img[5, 6] == 80.0
    assert img[5, 14] == 120.0  # max-combined
    assert img.sum() == 200.0


def test_bresenham_matches_reference_semantics():
    H = W = 40
    res = 0.5
    counts = np.zeros((H, W), np.int32)
    poses = np.asarray([[0.0, 0.0, 0.0]], np.float32)
    angles = np.asarray([0.0], np.float32)
    ranges = np.asarray([5.0], np.float32)
    out = native.bresenham_raytrace(counts, poses, angles, ranges,
                                    np.ones(1, np.uint8), res)
    assert out[20, 30] == 2          # hit cell
    assert np.all(out[20, 20:30] == -1)  # free cells
    assert out.sum() == 2 - 10


def test_device_raytracer_matches_native_bresenham_exactly():
    """The batched device raytracer evaluates the Bresenham recurrence in
    closed form; its counting grid must equal the reference-exact native
    transcription cell for cell."""
    rng = np.random.default_rng(0)
    H = W = 64
    res = 0.5
    n = 48
    poses = np.zeros((n, 3), np.float32)
    poses[n // 2:, :2] = rng.uniform(-3, 3, (n - n // 2, 2))
    poses[n // 2:, 2] = rng.uniform(-np.pi, np.pi, n - n // 2)
    angles = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    ranges = rng.uniform(2.0, 12.0, n).astype(np.float32)
    valid = np.ones(n, np.uint8)

    ref = native.bresenham_raytrace(np.zeros((H, W), np.int32),
                                    poses, angles, ranges, valid, res)
    dev = np.asarray(raytrace.raytrace_beams(
        jnp.zeros((H, W), jnp.int32), jnp.asarray(poses),
        jnp.stack([jnp.asarray(angles), jnp.asarray(ranges),
                   jnp.zeros(n)], axis=-1),
        jnp.ones(n, bool), res, max_steps=64,
    ))
    np.testing.assert_array_equal(dev, ref)


def test_fuse_counting_grids_matches_device():
    """Native MasterMap fusion == device scatter fusion on a rotated case."""
    import jax.numpy as jnp
    import numpy as np

    from randt_slam_tpu.io import native as NT
    from randt_slam_tpu.mapping import ogm as OGM

    rng = np.random.default_rng(3)
    counts = rng.integers(-30, 30, (2, 40, 40)).astype(np.int32)
    counts[rng.random((2, 40, 40)) < 0.7] = 0
    origins = np.asarray(
        [[1.05, -2.05, 0.31], [-3.55, 0.45, -1.2]], np.float32
    )
    gh = gw = 96
    host = NT.fuse_counting_grids(counts, origins, 0.5, 0.5, gh, gw)
    dev = np.asarray(OGM.fuse_submaps(
        jnp.asarray(counts, jnp.float32), jnp.asarray(origins),
        0.5, 0.5, jnp.zeros(3), gh, gw,
    ))
    np.testing.assert_allclose(host, dev, atol=1e-4)
