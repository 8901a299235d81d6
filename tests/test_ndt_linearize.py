"""Pallas fused NDT linearize vs the jacfwd reference path.

The kernel must reproduce the exact quantities ``matcher.estimate_window``'s
structured linearizer computes per window slot: IRLS-weighted normal-equation
blocks H = J^T W J, gradient g = J^T W r, robust-cost sum, and the max squared
residual used for GNC mu init.  Runs in interpreter mode on the CPU backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from randt_slam_tpu.ops import ndt_linearize as NL
from randt_slam_tpu.registration import barron
from randt_slam_tpu.registration import residuals as R


def _random_pairs(rng, W, N):
    def spd(n):
        A = rng.normal(0, 0.3, (n, 3, 3))
        return (A @ np.swapaxes(A, 1, 2) + 0.05 * np.eye(3)).astype(np.float32)

    m_mean = rng.uniform(-20, 20, (W, N, 3)).astype(np.float32)
    a_mean = (m_mean + rng.normal(0, 1.0, (W, N, 3))).astype(np.float32)
    m_cov = np.stack([spd(N) for _ in range(W)])
    a_cov = np.stack([spd(N) for _ in range(W)])
    valid = rng.random((W, N)) < 0.7
    poses = rng.normal(0, 0.5, (W, 3)).astype(np.float32)
    return (jnp.asarray(poses), jnp.asarray(m_mean), jnp.asarray(m_cov),
            jnp.asarray(a_mean), jnp.asarray(a_cov), jnp.asarray(valid))


def _ref(poses, m_mean, m_cov, a_mean, a_cov, valid,
         scale, alpha, mu, ndt_scale):
    """The slot linearizer of matcher.estimate_window, NDT part only."""
    def slot(pose, mm, mc, am, ac, v):
        def res(p):
            return R.ndt_residual(p[None, :], mm, mc, am, ac,
                                  use_intensity=True)

        r = res(pose)
        J = jax.jacfwd(res)(pose)
        w = ndt_scale * barron.weight(r * r, scale, alpha, mu)
        w = jnp.where(v, w, 0.0)
        H = jnp.einsum("n,ni,nj->ij", w, J, J)
        g = jnp.einsum("n,ni->i", w * r, J)
        rho = jnp.sum(jnp.where(v, barron.rho(r * r, scale, alpha, mu), 0.0))
        r2max = jnp.max(jnp.where(v, r * r, 0.0))
        return H, g, rho, r2max

    H, g, rho, r2m = jax.vmap(slot)(poses, m_mean, m_cov, a_mean, a_cov, valid)
    return H, g, jnp.sum(rho), jnp.max(r2m)


@pytest.mark.parametrize("alpha", [-2.0, 0.0, 2.0])
def test_linearize_matches_jacfwd(alpha):
    rng = np.random.default_rng(0)
    W, N = 3, 256
    poses, m_mean, m_cov, a_mean, a_cov, valid = _random_pairs(rng, W, N)
    scale, mu, ndt_scale = 1.0, 4.0, 0.37

    H_ref, g_ref, rho_ref, _ = _ref(
        poses, m_mean, m_cov, a_mean, a_cov, valid, scale, alpha, mu,
        ndt_scale)

    packed = NL.pack_pairs(m_mean, m_cov, a_mean, a_cov, valid)
    H, g, rho = NL.linearize(poses, mu, ndt_scale, packed,
                             scale=scale, alpha=alpha, interpret=True)

    np.testing.assert_allclose(np.asarray(H), np.asarray(H_ref),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(float(rho), float(rho_ref), rtol=1e-4)


def test_cost_matches_reference():
    rng = np.random.default_rng(1)
    W, N = 2, 128
    poses, m_mean, m_cov, a_mean, a_cov, valid = _random_pairs(rng, W, N)
    scale, alpha, mu = 1.5, 0.0, 2.0

    _, _, rho_ref, r2m_ref = _ref(
        poses, m_mean, m_cov, a_mean, a_cov, valid, scale, alpha, mu, 1.0)
    packed = NL.pack_pairs(m_mean, m_cov, a_mean, a_cov, valid)
    rho, r2m = NL.robust_cost(poses, mu, packed, scale=scale, alpha=alpha,
                              interpret=True)
    np.testing.assert_allclose(float(rho), float(rho_ref), rtol=1e-4)
    np.testing.assert_allclose(float(r2m), float(r2m_ref), rtol=1e-4)


def test_all_invalid_slot_is_zero():
    rng = np.random.default_rng(2)
    W, N = 1, 64
    poses, m_mean, m_cov, a_mean, a_cov, _ = _random_pairs(rng, W, N)
    valid = jnp.zeros((W, N), bool)
    packed = NL.pack_pairs(m_mean, m_cov, a_mean, a_cov, valid)
    H, g, rho = NL.linearize(poses, 1.0, 1.0, packed, scale=1.0, alpha=-2.0,
                             interpret=True)
    assert float(jnp.abs(H).max()) == 0.0
    assert float(jnp.abs(g).max()) == 0.0
    assert float(rho) == 0.0
