import numpy as np
import jax.numpy as jnp

from randt_slam_tpu.ndt import cells as C


def make_points(rng, n, center=(0.0, 0.0, 50.0), spread=1.0):
    pts = rng.normal(0, spread, (n, 3)) + np.asarray(center)
    return pts.astype(np.float32)


def test_from_points_matches_numpy_moments():
    rng = np.random.default_rng(0)
    pts = make_points(rng, 64)
    ids = rng.integers(0, 4, 64).astype(np.int32)
    mask = rng.random(64) > 0.2
    stats = C.from_points(jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(ids), 4)
    for k in range(4):
        sel = (ids == k) & mask
        n = sel.sum()
        if n == 0:
            continue
        mu_np = pts[sel].mean(axis=0)
        cov_np = np.cov(pts[sel].T, bias=True) if n > 1 else np.zeros((3, 3))
        np.testing.assert_allclose(float(stats.n[k]), n, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(C.mean(stats))[k], mu_np, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(C.raw_cov(stats))[k], cov_np, rtol=1e-2, atol=1e-3
        )


def test_merge_equals_joint():
    rng = np.random.default_rng(1)
    a_pts = make_points(rng, 30)
    b_pts = make_points(rng, 25, center=(3.0, 1.0, 60.0))
    ids = np.zeros(30, np.int32)
    sa = C.from_points(jnp.asarray(a_pts), jnp.ones(30, bool), jnp.asarray(ids), 1)
    sb = C.from_points(jnp.asarray(b_pts), jnp.ones(25, bool), jnp.zeros(25, jnp.int32), 1)
    merged = C.merge(sa, sb)
    joint = C.from_points(
        jnp.asarray(np.concatenate([a_pts, b_pts])),
        jnp.ones(55, bool),
        jnp.zeros(55, jnp.int32),
        1,
    )
    np.testing.assert_allclose(np.asarray(merged.n), np.asarray(joint.n))
    np.testing.assert_allclose(np.asarray(merged.s), np.asarray(joint.s), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(merged.ss), np.asarray(joint.ss), rtol=1e-4)


def test_transform_matches_transformed_points():
    rng = np.random.default_rng(2)
    pts = make_points(rng, 40, center=(5.0, -2.0, 40.0))
    stats = C.from_points(
        jnp.asarray(pts), jnp.ones(40, bool), jnp.zeros(40, jnp.int32), 1
    )
    pose = jnp.asarray([[2.0, -1.0, 0.7]], dtype=jnp.float32)
    moved = C.transform(
        C.CellStats(stats.n[None], stats.s[None], stats.ss[None]), pose
    )
    # transform the raw points and re-accumulate
    c, s = np.cos(0.7), np.sin(0.7)
    Rm = np.array([[c, -s], [s, c]])
    pts2 = pts.copy()
    pts2[:, :2] = pts[:, :2] @ Rm.T + np.array([2.0, -1.0])
    ref = C.from_points(
        jnp.asarray(pts2), jnp.ones(40, bool), jnp.zeros(40, jnp.int32), 1
    )
    np.testing.assert_allclose(np.asarray(moved.s[0, 0]), np.asarray(ref.s[0]), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(moved.ss[0, 0]), np.asarray(ref.ss[0]), rtol=2e-3, atol=2e-2
    )


def test_regularize_cov_eig_floor():
    # Degenerate (collinear) position covariance gets its small eigenvalue
    # floored at ratio * lambda_max (``ndt_cell.cpp:102-112``).
    cov = np.zeros((3, 3), np.float32)
    v = np.array([1.0, 2.0]) / np.sqrt(5.0)
    cov[:2, :2] = 9.0 * np.outer(v, v)
    cov[2, 2] = 4.0
    out = np.asarray(C.regularize_cov(jnp.asarray(cov), 0.001, 1e-6))
    w = np.linalg.eigvalsh(out[:2, :2])
    np.testing.assert_allclose(w.max(), 9.0, rtol=1e-4)
    np.testing.assert_allclose(w.min(), 0.009, rtol=1e-3)
    np.testing.assert_allclose(out[2, 2], 4.0 + 1e-6, rtol=1e-6)
    # Well-conditioned covariance is untouched.
    cov2 = np.diag([2.0, 1.0, 3.0]).astype(np.float32)
    out2 = np.asarray(C.regularize_cov(jnp.asarray(cov2), 0.001, 1e-6))
    np.testing.assert_allclose(out2[:2, :2], cov2[:2, :2], atol=1e-5)


def test_solve3_inv3_det3():
    rng = np.random.default_rng(3)
    A = rng.normal(size=(5, 3, 3)).astype(np.float32)
    S = A @ np.transpose(A, (0, 2, 1)) + np.eye(3, dtype=np.float32)
    d = rng.normal(size=(5, 3)).astype(np.float32)
    x = np.asarray(C.solve3(jnp.asarray(S), jnp.asarray(d)))
    np.testing.assert_allclose(
        np.einsum("bij,bj->bi", S, x), d, rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(C.det3(jnp.asarray(S))), np.linalg.det(S), rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(C.inv3(jnp.asarray(S))), np.linalg.inv(S), rtol=1e-2, atol=1e-4
    )


def test_mahalanobis_sq_intensity():
    mu_a = jnp.asarray([0.0, 0.0, 0.0])
    mu_b = jnp.asarray([1.0, 0.0, 0.0])
    cov = jnp.eye(3) * 0.5
    m = float(C.mahalanobis_sq_intensity(mu_a, cov, mu_b, cov))
    np.testing.assert_allclose(m, 1.0, rtol=1e-5)


def test_compact_keeps_largest():
    n = jnp.asarray([0.0, 5.0, 2.0, 9.0, 1.0])
    stats = C.CellStats(n=n, s=jnp.zeros((5, 3)), ss=jnp.zeros((5, 3, 3)))
    out, idx = C.compact(stats, 3)
    assert set(np.asarray(idx).tolist()) == {3, 1, 2}
