"""Submap-sharded Schur-complement pose-graph solve (graph/schur.py).

Validates against the dense single-device solver on a SLAM-shaped graph
(submap chains whose roots take the loop edges), single-device and on the
8-virtual-device CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from randt_slam_tpu.config import GlobalFuserConfig
from randt_slam_tpu.graph import pose_graph as PG
from randt_slam_tpu.graph import schur


def _slam_graph(seed=0, n_submaps=6, nodes_per=10, n_loops=4):
    """Noisy circular drive split into submaps; loop edges root->interior."""
    rng = np.random.default_rng(seed)
    N = n_submaps * nodes_per
    t = np.linspace(0, 2 * np.pi, N, endpoint=False)
    gt = np.stack([30 * np.cos(t), 30 * np.sin(t), t + np.pi / 2], 1)
    noisy = gt + np.concatenate(
        [np.zeros((1, 3)), np.cumsum(rng.normal(0, 0.02, (N - 1, 3)), 0)]
    )
    node_submap = np.repeat(np.arange(n_submaps), nodes_per)
    node_is_root = np.zeros(N, bool)
    node_is_root[::nodes_per] = True

    def rel(a, b):
        c, s = np.cos(a[2]), np.sin(a[2])
        d = b - a
        return np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1],
                         np.arctan2(np.sin(d[2]), np.cos(d[2]))])

    eb = list(range(N - 1))
    ee = list(range(1, N))
    trans = [rel(gt[i], gt[i + 1]) for i in range(N - 1)]
    # loop edges: root of submap m -> interior node of a later submap
    roots = np.nonzero(node_is_root)[0]
    for k in range(n_loops):
        m = roots[k % n_submaps]
        q = int(rng.integers(0, N))
        if node_is_root[q] or node_submap[q] == node_submap[m]:
            q = (m + nodes_per + 3) % N
            if node_is_root[q]:
                q += 1
        eb.append(int(m)); ee.append(int(q))
        trans.append(rel(gt[m], gt[q]))
    E = len(eb)
    sqrtI = np.tile(np.diag([10.0, 10.0, 20.0]), (E, 1, 1))
    g = PG.PoseGraph(
        poses=jnp.asarray(noisy, jnp.float32),
        id_begin=jnp.asarray(eb, jnp.int32),
        id_end=jnp.asarray(ee, jnp.int32),
        trans=jnp.asarray(np.stack(trans), jnp.float32),
        sqrt_information=jnp.asarray(sqrtI, jnp.float32),
        valid=jnp.ones(E, bool),
    )
    return g, node_submap, node_is_root, gt


def assert_poses_close(a, b, atol):
    """SE(2) pose equality: yaw compared modulo 2*pi (both solvers may
    normalize an angle onto opposite sides of the wrap)."""
    a = np.asarray(a).copy()
    b = np.asarray(b).copy()
    dyaw = a[:, 2] - b[:, 2]
    a[:, 2] = np.arctan2(np.sin(dyaw), np.cos(dyaw))
    b[:, 2] = 0.0
    np.testing.assert_allclose(a, b, atol=atol)


def test_layout_partitions_all_edges():
    g, node_submap, node_is_root, _ = _slam_graph()
    lay = schur.build_layout(node_submap, node_is_root,
                             np.asarray(g.id_begin), np.asarray(g.id_end))
    n_owned = int((lay.edge_idx >= 0).sum()) + len(lay.ss_idx)
    assert n_owned == len(g.id_begin)
    # every interior appears exactly once
    ints = lay.int_node[lay.int_node >= 0]
    assert len(np.unique(ints)) == len(ints)
    assert len(ints) + len(lay.root_node) == g.poses.shape[0]


def test_schur_matches_dense_single_device():
    g, node_submap, node_is_root, gt = _slam_graph()
    cfg = GlobalFuserConfig()
    dense, _ = PG.optimize(g, cfg)
    sch, info = schur.optimize_schur(g, cfg, node_submap, node_is_root)
    assert_poses_close(sch, dense, atol=2e-3)
    assert info["iterations"] >= 1


def test_schur_sharded_matches_dense():
    from randt_slam_tpu.parallel.mesh import data_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device backend")
    mesh = data_mesh()
    g, node_submap, node_is_root, _ = _slam_graph(n_submaps=8, nodes_per=12,
                                                  n_loops=6)
    cfg = GlobalFuserConfig()
    dense, _ = PG.optimize(g, cfg)
    sch, _ = schur.optimize_schur(g, cfg, node_submap, node_is_root,
                                  mesh=mesh)
    assert_poses_close(sch, dense, atol=2e-3)


def test_optimize_auto_dispatch():
    """Size-routed solve: dense below the node limit, Schur above; both
    reach the same optimum and report which path ran."""
    g, node_submap, node_is_root, _ = _slam_graph()
    cfg = GlobalFuserConfig()
    dense, info_d = schur.optimize_auto(
        g, cfg, node_submap=node_submap, node_is_root=node_is_root)
    assert info_d["solver"] == "dense"
    sch, info_s = schur.optimize_auto(
        g, cfg, node_submap=node_submap, node_is_root=node_is_root,
        dense_node_limit=8)
    assert info_s["solver"] == "schur"
    assert_poses_close(sch, dense, atol=2e-3)
    # max_update_index gating applies in either path (global_fuser.cpp:31)
    gated, _ = schur.optimize_auto(
        g, cfg, node_submap=node_submap, node_is_root=node_is_root,
        max_update_index=0)
    consecutive = np.asarray(g.id_begin) + 1 == np.asarray(g.id_end)
    odo_only, _ = PG.optimize(
        g._replace(valid=g.valid & jnp.asarray(consecutive)), cfg)
    assert_poses_close(gated, odo_only, atol=2e-3)


def test_schur_handles_single_node_submaps():
    """Root-root (separator-separator) consecutive edges must be covered."""
    g, node_submap, node_is_root, _ = _slam_graph(n_submaps=4, nodes_per=1,
                                                  n_loops=0)
    cfg = GlobalFuserConfig()
    dense, _ = PG.optimize(g, cfg)
    sch, _ = schur.optimize_schur(g, cfg, node_submap, node_is_root)
    assert_poses_close(sch, dense, atol=2e-3)
