import numpy as np
import jax.numpy as jnp

from randt_slam_tpu.config import GlobalFuserConfig
from randt_slam_tpu.graph import pose_graph as PG
from randt_slam_tpu import geometry as geo


def make_circle_graph(rng, n=30, drift=0.02, n_loops=3):
    """Ground truth on a circle; odometry edges with simulated drift; exact
    loop edges.  Classic PGO smoke problem."""
    gt = np.zeros((n, 3))
    for i in range(1, n):
        th = 2 * np.pi * i / n
        gt[i] = [10 * np.cos(th) - 10, 10 * np.sin(th), geo.normalize_angle(th + np.pi / 2)]
    gt[:, 2] = np.arctan2(np.sin(gt[:, 2]), np.cos(gt[:, 2]))

    # noisy odometry chain
    est = gt.copy()
    rels = []
    for i in range(1, n):
        rel = np.asarray(geo.relative(jnp.asarray(gt[i - 1]), jnp.asarray(gt[i])))
        noisy = rel + rng.normal(0, drift, 3)
        rels.append(noisy)
    for i in range(1, n):
        est[i] = np.asarray(geo.compose(jnp.asarray(est[i - 1]), jnp.asarray(rels[i - 1])))

    eb = list(range(n - 1))
    ee = list(range(1, n))
    et = [r for r in rels]
    ei = [np.diag([10.0, 10.0, 50.0])] * (n - 1)
    # exact loop closures to ground truth
    for k in range(n_loops):
        a, b = 0, n - 1 - k * 2
        rel = np.asarray(geo.relative(jnp.asarray(gt[a]), jnp.asarray(gt[b])))
        eb.append(a); ee.append(b); et.append(rel)
        ei.append(np.diag([30.0, 30.0, 30.0]))
    E = len(eb)
    g = PG.PoseGraph(
        poses=jnp.asarray(est, jnp.float32),
        id_begin=jnp.asarray(eb, jnp.int32),
        id_end=jnp.asarray(ee, jnp.int32),
        trans=jnp.asarray(np.stack(et), jnp.float32),
        sqrt_information=jnp.asarray(np.stack(ei), jnp.float32),
        valid=jnp.ones(E, bool),
    )
    return g, gt, est


def test_residual_zero_on_consistent_graph():
    rng = np.random.default_rng(0)
    g, gt, _ = make_circle_graph(rng, drift=0.0)
    r = PG.edge_residuals(jnp.asarray(gt, jnp.float32), g)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-3)


def test_jacobians_match_autodiff():
    import jax
    rng = np.random.default_rng(1)
    g, gt, est = make_circle_graph(rng)
    poses = jnp.asarray(est, jnp.float32)

    def res_flat(p):
        return PG.edge_residuals(p.reshape(-1, 3), g).reshape(-1)

    J = jax.jacfwd(res_flat)(poses.reshape(-1)).reshape(len(g.id_begin), 3, -1, 3)
    Ja, Jb = PG._edge_jacobians(poses, g)
    for e in range(len(g.id_begin)):
        a, b = int(g.id_begin[e]), int(g.id_end[e])
        np.testing.assert_allclose(np.asarray(J[e, :, a]), np.asarray(Ja[e]),
                                   atol=2e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(J[e, :, b]), np.asarray(Jb[e]),
                                   atol=2e-3, rtol=1e-3)


def test_optimize_recovers_circle():
    rng = np.random.default_rng(2)
    g, gt, est = make_circle_graph(rng, n=40, drift=0.03, n_loops=4)
    drift_err = np.sqrt(np.mean(np.sum((est[:, :2] - gt[:, :2]) ** 2, axis=1)))
    poses, info = PG.optimize(g, GlobalFuserConfig())
    poses = np.asarray(poses)
    opt_err = np.sqrt(np.mean(np.sum((poses[:, :2] - gt[:, :2]) ** 2, axis=1)))
    assert opt_err < 0.4 * drift_err, (drift_err, opt_err)
    # gauge: node 0 unchanged
    np.testing.assert_allclose(poses[0], est[0], atol=1e-6)


def test_max_update_index_filters_loop_edges():
    rng = np.random.default_rng(3)
    g, gt, est = make_circle_graph(rng, n=20, drift=0.05, n_loops=2)
    # exclude all loop edges -> result equals odometry-only optimization,
    # which (chain + gauge fix) keeps the initial guess
    poses, _ = PG.optimize(g, GlobalFuserConfig(), max_update_index=0)
    np.testing.assert_allclose(np.asarray(poses), est, atol=2e-2)


def test_recover_covariances_chain_growth():
    """Marginal covariance grows along an odometry chain and is zero at the
    gauge-fixed node (the reference's commented-out ceres::Covariance path,
    ``global_fuser.cpp:62-87``)."""
    import jax.numpy as jnp
    import numpy as np

    from randt_slam_tpu.config import GlobalFuserConfig
    from randt_slam_tpu.graph import pose_graph as PG

    N = 5
    poses = jnp.asarray(
        np.cumsum(np.tile([1.0, 0.0, 0.0], (N, 1)), 0), jnp.float32
    )
    g = PG.PoseGraph(
        poses=poses,
        id_begin=jnp.arange(N - 1, dtype=jnp.int32),
        id_end=jnp.arange(1, N, dtype=jnp.int32),
        trans=jnp.tile(jnp.asarray([1.0, 0.0, 0.0]), (N - 1, 1)),
        sqrt_information=jnp.tile(jnp.eye(3), (N - 1, 1, 1)),
        valid=jnp.ones(N - 1, bool),
    )
    cov = np.asarray(PG.recover_covariances(g, poses, GlobalFuserConfig()))
    assert np.allclose(cov[0], 0.0)
    sx = cov[:, 0, 0]
    assert np.all(np.diff(sx[1:]) > 0), sx
    np.testing.assert_allclose(sx[1], 1.0, rtol=1e-4)
