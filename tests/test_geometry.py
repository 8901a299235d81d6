import numpy as np
import jax.numpy as jnp

from randt_slam_tpu import geometry as geo


def rand_pose(rng):
    return jnp.asarray(
        [rng.uniform(-10, 10), rng.uniform(-10, 10), rng.uniform(-np.pi, np.pi)],
        dtype=jnp.float32,
    )


def test_normalize_angle():
    th = jnp.asarray([0.0, np.pi, -np.pi, 3 * np.pi, -2.5 * np.pi, 0.1])
    out = np.asarray(geo.normalize_angle(th))
    assert np.all(out > -np.pi - 1e-6) and np.all(out <= np.pi + 1e-6)
    np.testing.assert_allclose(np.sin(out), np.sin(np.asarray(th)), atol=1e-6)
    np.testing.assert_allclose(np.cos(out), np.cos(np.asarray(th)), atol=1e-6)


def test_compose_inverse_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        a, b = rand_pose(rng), rand_pose(rng)
        ab = geo.compose(a, b)
        b2 = geo.compose(geo.inverse(a), ab)
        np.testing.assert_allclose(np.asarray(b2), np.asarray(b), atol=1e-4)
        ident = geo.compose(a, geo.inverse(a))
        np.testing.assert_allclose(np.asarray(ident), np.zeros(3), atol=1e-4)


def test_compose_matches_matrix_product():
    rng = np.random.default_rng(1)
    a, b = rand_pose(rng), rand_pose(rng)
    Ma = np.asarray(geo.pose_matrix(a))
    Mb = np.asarray(geo.pose_matrix(b))
    Mab = np.asarray(geo.pose_matrix(geo.compose(a, b)))
    np.testing.assert_allclose(Mab, Ma @ Mb, atol=1e-5)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(2)
    for scale in (1e-8, 0.01, 1.0, 3.0):
        t = jnp.asarray(rng.uniform(-1, 1, 3) * scale, dtype=jnp.float32)
        p = geo.exp(t)
        t2 = geo.log(p)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-5)


def test_transform_points():
    pose = jnp.asarray([1.0, 2.0, np.pi / 2], dtype=jnp.float32)
    pts = jnp.asarray([[1.0, 0.0], [0.0, 1.0]], dtype=jnp.float32)
    out = np.asarray(geo.transform_points(pose, pts))
    np.testing.assert_allclose(out, [[1.0, 3.0], [0.0, 2.0]], atol=1e-5)
