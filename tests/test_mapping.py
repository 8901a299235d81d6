import numpy as np
import jax.numpy as jnp

from randt_slam_tpu.mapping import raytrace, ogm
from randt_slam_tpu.ndt import divergence as D
from randt_slam_tpu.ndt import cells as C


def test_raytrace_free_and_hit_counts():
    H = W = 40
    res = 0.5
    counts = jnp.zeros((H, W), jnp.int32)
    poses = jnp.asarray([[0.0, 0.0, 0.0]])
    beams = jnp.asarray([[0.0, 5.0, 100.0]])  # along +x, 5 m
    out = np.asarray(raytrace.raytrace_beams(
        counts, poses, beams, jnp.ones(1, bool), res, max_steps=64
    ))
    # endpoint cell at x=5 -> ix = 5/0.5 + 20 = 30
    assert out[20, 30] == 2
    # free cells along the ray decremented exactly once
    ray = out[20, 20:30]
    assert np.all(ray == -1), ray
    # nothing else touched
    assert out.sum() == 2 - 10


def test_raytrace_respects_rotation_and_origin():
    H = W = 40
    res = 0.5
    counts = jnp.zeros((H, W), jnp.int32)
    poses = jnp.asarray([[2.0, 1.0, np.pi / 2]])  # facing +y from (2,1)
    beams = jnp.asarray([[0.0, 3.0, 50.0]])
    out = np.asarray(raytrace.raytrace_beams(
        counts, poses, beams, jnp.ones(1, bool), res, max_steps=64
    ))
    # endpoint at (2, 4): ix = 2/0.5+20 = 24, iy = 4/0.5+20 = 28
    assert out[28, 24] == 2


def test_occupancy_mappings():
    # count 0 -> zeta=2 -> occ = 100*( -2*(.5)^3 + 3*(.5)^2 ) = 50
    occ = float(ogm.submap_occupancy(jnp.asarray(0)))
    np.testing.assert_allclose(occ, 50.0, atol=1e-4)
    assert float(ogm.submap_occupancy(jnp.asarray(100))) == 100.0
    assert float(ogm.submap_occupancy(jnp.asarray(-100))) == 0.0
    g = np.asarray(ogm.global_occupancy(jnp.asarray([0, 100, -200])))
    assert g[0] == -1.0  # unknown
    np.testing.assert_allclose(g[1], 100.0, atol=1e-3)
    np.testing.assert_allclose(g[2], 0.0, atol=1e-3)


def test_fuse_submaps_identity():
    sh = sw = 16
    res = 0.5
    counts = np.zeros((1, sh, sw), np.int32)
    counts[0, 4, 6] = 8
    counts[0, 10, 2] = -4
    origins = jnp.zeros((1, 3))
    total = np.asarray(ogm.fuse_submaps(
        jnp.asarray(counts), origins, res, res, jnp.zeros(3), sh, sw
    ))
    # Cell positions are corner-anchored (``ndt_master_map.cpp:55-58``) and
    # the 4 anti-aliasing samples straddle the corner, so each source cell
    # spreads its max-magnitude count into its 2x2 neighborhood.
    assert total[4, 6] == 8
    assert total[10, 2] == -4
    nz = np.argwhere(total != 0)
    assert 2 <= len(nz) <= 8
    for y, x in nz:
        assert abs(total[y, x]) in (4, 8)
        assert (3 <= y <= 4 and 5 <= x <= 6) or (9 <= y <= 10 and 1 <= x <= 2)


def _gauss_cells(rng, n, spread=1.0):
    mu = np.zeros((n, 3), np.float32)
    mu[:, :2] = rng.uniform(-10, 10, (n, 2))
    mu[:, 2] = rng.uniform(50, 100, n)
    cov = np.zeros((n, 3, 3), np.float32)
    for i in range(n):
        A = rng.normal(0, spread, (2, 2))
        cov[i, :2, :2] = A @ A.T + 0.3 * np.eye(2)
        cov[i, 2, 2] = 5.0
    return jnp.asarray(mu), jnp.asarray(cov)


def test_cs_divergence_discriminates_alignment():
    rng = np.random.default_rng(0)
    mu, cov = _gauss_cells(rng, 30)
    valid = jnp.ones(30, bool)
    same = float(D.cs_divergence(mu, cov, valid, mu, cov, valid))
    shifted = mu.at[:, 0].add(6.0)
    far = float(D.cs_divergence(mu, cov, valid, shifted, cov, valid))
    assert np.isfinite(same) and np.isfinite(far)
    assert far > same + 0.5


def test_cs_divergence_finite_with_padding():
    rng = np.random.default_rng(1)
    mu, cov = _gauss_cells(rng, 20)
    # half the slots invalid with garbage covariances
    cov = cov.at[10:].set(0.0)
    valid = jnp.arange(20) < 10
    v = float(D.cs_divergence(mu, cov, valid, mu, cov, valid))
    assert np.isfinite(v)


def test_self_term_rigid_invariance():
    from randt_slam_tpu.registration import matcher
    rng = np.random.default_rng(2)
    mu, cov = _gauss_cells(rng, 25)
    valid = jnp.ones(25, bool)
    t0 = float(D.self_term(mu, cov, valid))
    mu2, cov2 = matcher.transform_mean_cov(jnp.asarray([3.0, -2.0, 0.8]), mu, cov)
    t1 = float(D.self_term(mu2, cov2, valid))
    np.testing.assert_allclose(t0, t1, rtol=2e-3)
