"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as GE

from randt_slam_tpu.config import GlobalFuserConfig
from randt_slam_tpu.graph import pose_graph as PG
from randt_slam_tpu.graph import schur
from randt_slam_tpu.parallel.mesh import data_mesh


def test_entry_compiles_and_runs():
    fn, args = GE.entry()
    carry, out = jax.jit(fn)(*args)
    assert out.odom_pose.shape == (3,)
    assert np.isfinite(np.asarray(out.odom_pose)).all()


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8
    GE.dryrun_multichip(8)


def test_distributed_pgo_matches_single_device():
    from tests.test_pose_graph import make_circle_graph

    rng = np.random.default_rng(0)
    g, gt, est = make_circle_graph(rng, n=24, drift=0.03, n_loops=3)
    cfg = GlobalFuserConfig()
    single, _ = PG.optimize(g, cfg)
    mesh = data_mesh(8)
    multi, _ = schur.optimize_distributed(g, cfg, mesh)
    np.testing.assert_allclose(np.asarray(multi), np.asarray(single),
                               atol=5e-3)
