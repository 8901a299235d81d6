import numpy as np
import jax
import jax.numpy as jnp

from randt_slam_tpu.config import SlamConfig, MapConfig, MatcherConfig, derive
from randt_slam_tpu.ndt import cells as C
from randt_slam_tpu.registration import barron, matcher
from randt_slam_tpu.registration import residuals as R


def test_barron_weight_is_rho_derivative():
    s = jnp.linspace(0.01, 30.0, 50)
    for alpha in (-2.0, 0.0, 2.0, 1.0):
        for mu in (1.0, 5.0):
            rho = lambda x: barron.rho(x, 1.3, alpha, mu)
            grad = jax.vmap(jax.grad(rho))(s)
            w = barron.weight(s, 1.3, alpha, mu)
            np.testing.assert_allclose(np.asarray(w), np.asarray(grad), rtol=1e-3)


def test_barron_cauchy_and_quadratic_limits():
    s = jnp.asarray([0.5, 4.0])
    np.testing.assert_allclose(np.asarray(barron.rho(s, 2.0, 3.0, 1.0)), np.asarray(s))
    # alpha ~ 0: b log(1 + s/b)
    out = np.asarray(barron.rho(s, 1.0, 0.0, 2.0))
    np.testing.assert_allclose(out, 2.0 * np.log1p(np.asarray(s) / 2.0), rtol=1e-5)


def test_gnc_schedule_matches_reference_arithmetic():
    mu0 = barron.gnc_mu_init(jnp.asarray(8.0), 1.0, 10, 1.4)
    np.testing.assert_allclose(float(mu0), min(16.0, 1.4**9), rtol=1e-6)
    assert bool(barron.gnc_continue(jnp.asarray(1.0), 1.4))
    assert not bool(barron.gnc_continue(jnp.asarray(0.8), 1.4))


def test_predict_state_clamps_dt_and_rotates_midpoint():
    s = jnp.zeros(9).at[R.VX].set(2.0).at[R.OM].set(0.5)
    out = np.asarray(R.predict_state(s, jnp.asarray(0.01)))  # clamped to 0.2
    dt = 0.2
    mid = 0.5 * dt * 0.5
    np.testing.assert_allclose(out[R.X], np.cos(mid) * 2.0 * dt, rtol=1e-5)
    np.testing.assert_allclose(out[R.Y], np.sin(mid) * 2.0 * dt, rtol=1e-5)
    np.testing.assert_allclose(out[R.TH], dt * 0.5, rtol=1e-5)


def test_motion_residual_zero_for_perfect_prediction():
    s0 = jnp.zeros(9).at[R.VX].set(1.5).at[R.OM].set(0.3)
    s1 = R.predict_state(s0, jnp.asarray(0.5))
    sqrtI = jnp.eye(8)
    r = np.asarray(R.motion_residual(s0, s1, jnp.asarray(0.5), sqrtI))
    np.testing.assert_allclose(r, np.zeros(8), atol=1e-6)


def test_ndt_residual_whitening():
    pose = jnp.asarray([0.0, 0.0, 0.0])
    m_mean = jnp.asarray([1.0, 0.0, 5.0])
    f_mean = jnp.asarray([0.0, 0.0, 5.0])
    cov = jnp.eye(3) * 0.5
    r = float(R.ndt_residual(pose, m_mean, cov, f_mean, cov))
    np.testing.assert_allclose(r, 1.0, rtol=1e-5)  # sqrt(1/(0.5+0.5))
    # perfect alignment -> ~0
    r0 = float(R.ndt_residual(pose, f_mean, cov, f_mean, cov))
    assert r0 < 1e-4


def _random_cells(rng, n, extent=20.0):
    mu = np.zeros((n, 3), np.float32)
    mu[:, :2] = rng.uniform(-extent, extent, (n, 2))
    mu[:, 2] = rng.uniform(40, 120, n)
    cov = np.zeros((n, 3, 3), np.float32)
    for i in range(n):
        A = rng.normal(0, 0.4, (2, 2))
        cov[i, :2, :2] = A @ A.T + 0.05 * np.eye(2)
        cov[i, 2, 2] = rng.uniform(2.0, 20.0)
    return jnp.asarray(mu), jnp.asarray(cov)


def test_estimate_loop_recovers_known_transform():
    rng = np.random.default_rng(0)
    cfg = derive(SlamConfig(
        ndt_map=MapConfig(size_x=200, size_y=200, resolution=2.0),
        matcher=MatcherConfig(smoothing_steps=3),
    ))
    n = 60
    m_mu, m_cov = _random_cells(rng, n)
    true_pose = jnp.asarray([1.2, -0.8, 0.15])
    f_mu, f_cov = matcher.transform_mean_cov(true_pose, m_mu, m_cov)
    valid = jnp.ones(n, bool)
    init = jnp.asarray([0.8, -0.5, 0.05])  # off by ~0.5 m / 0.1 rad
    est = matcher.estimate_loop(cfg, init, f_mu, f_cov, valid, m_mu, m_cov, valid)
    np.testing.assert_allclose(np.asarray(est.pose), np.asarray(true_pose), atol=0.02)
    # Second-nearest-neighbor pairs keep the mean cost away from zero even at
    # perfect alignment; just require it to be small.
    assert float(est.mean_cost) < 0.5
    assert int(est.n_pairs) > 0


def test_estimate_loop_robust_to_outlier_cells():
    rng = np.random.default_rng(1)
    cfg = derive(SlamConfig(
        ndt_map=MapConfig(size_x=200, size_y=200, resolution=2.0),
    ))
    n = 80
    m_mu, m_cov = _random_cells(rng, n)
    true_pose = jnp.asarray([0.9, 0.4, -0.1])
    f_mu, f_cov = matcher.transform_mean_cov(true_pose, m_mu, m_cov)
    # corrupt 20% of the fixed cells
    n_out = 16
    f_mu = f_mu.at[:n_out, :2].add(jnp.asarray(rng.uniform(3, 6, (n_out, 2)) *
                                               rng.choice([-1, 1], (n_out, 2))))
    valid = jnp.ones(n, bool)
    init = jnp.asarray([0.6, 0.2, 0.0])
    est = matcher.estimate_loop(cfg, init, f_mu, f_cov, valid, m_mu, m_cov, valid)
    np.testing.assert_allclose(np.asarray(est.pose), np.asarray(true_pose), atol=0.1)
