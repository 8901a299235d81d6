import numpy as np
import jax.numpy as jnp

from randt_slam_tpu.config import MapConfig, CellConfig
from randt_slam_tpu.ndt import cells as C
from randt_slam_tpu.ndt import grid as G


def make_cells(rng, centers, n_pts=20, spread=0.4):
    all_stats = []
    for cx, cy, ci in centers:
        pts = rng.normal(0, spread, (n_pts, 3)).astype(np.float32) + np.asarray(
            [cx, cy, ci], np.float32
        )
        st = C.from_points(
            jnp.asarray(pts), jnp.ones(n_pts, bool), jnp.zeros(n_pts, jnp.int32), 1
        )
        all_stats.append(st)
    return C.CellStats(
        n=jnp.stack([s.n[0] for s in all_stats]),
        s=jnp.stack([s.s[0] for s in all_stats]),
        ss=jnp.stack([s.ss[0] for s in all_stats]),
    )


def test_scatter_and_window_neighbors():
    rng = np.random.default_rng(0)
    m = MapConfig(size_x=40, size_y=40, resolution=2.0, min_points_per_cell=10)
    geom = G.GridGeom.from_config(m)
    centers = [(-10.0, -10.0, 50.0), (0.0, 0.0, 80.0), (2.5, 0.0, 90.0), (20.0, 14.0, 70.0)]
    cells = make_cells(rng, centers)
    grid = G.scatter_cells(geom, G.empty_grid(geom), cells, jnp.ones(4, bool))
    assert float(jnp.sum(grid.n)) == 80.0

    gm, gc, gv = G.derive_grid_fields(grid, m.min_points_per_cell, CellConfig())
    assert int(jnp.sum(gv)) == 4

    # Query near (1, 0): closest two cells are the ones at (0,0) and (2.5,0).
    q_mu = jnp.asarray([[1.0, 0.2, 85.0]])
    q_cov = jnp.broadcast_to(jnp.eye(3) * 0.2, (1, 3, 3))
    nb = G.window_neighbors(
        geom, gm, gc, gv, q_mu, q_cov, jnp.ones(1, bool), k=2, radius=2
    )
    assert bool(nb.valid[0, 0]) and bool(nb.valid[0, 1])
    got = sorted(np.asarray(nb.mean)[0, :, 0].tolist())
    assert abs(got[0] - 0.0) < 0.5 and abs(got[1] - 2.5) < 0.5

    # Far query: no occupied cells in window.
    q_far = jnp.asarray([[-30.0, 30.0, 50.0]])
    nb2 = G.window_neighbors(
        geom, gm, gc, gv, q_far, q_cov, jnp.ones(1, bool), k=2, radius=2
    )
    assert not bool(nb2.valid[0, 0])


def test_scatter_merges_colliding_cells():
    m = MapConfig(size_x=10, size_y=10, resolution=4.0, min_points_per_cell=2)
    geom = G.GridGeom.from_config(m)
    rng = np.random.default_rng(1)
    cells = make_cells(rng, [(1.0, 1.0, 10.0), (1.2, 0.8, 12.0)], n_pts=8, spread=0.1)
    grid = G.scatter_cells(geom, G.empty_grid(geom), cells, jnp.ones(2, bool))
    ix, iy, ok = G.cell_index(geom, jnp.asarray([[1.1, 0.9]]))
    n_here = grid.n[int(iy[0]), int(ix[0])]
    assert float(n_here) == 16.0


def test_transform_grid_rekeys():
    m = MapConfig(size_x=20, size_y=20, resolution=2.0, min_points_per_cell=5)
    geom = G.GridGeom.from_config(m)
    rng = np.random.default_rng(2)
    cells = make_cells(rng, [(4.0, 0.0, 30.0)], n_pts=12, spread=0.2)
    grid = G.scatter_cells(geom, G.empty_grid(geom), cells, jnp.ones(1, bool))
    pose = jnp.asarray([0.0, 6.0, 0.0])  # shift +6 in y
    out = G.transform_grid(geom, grid, pose, m.min_points_per_cell)
    gm, _, gv = G.derive_grid_fields(out, m.min_points_per_cell, CellConfig())
    occ = np.argwhere(np.asarray(gv))
    assert len(occ) == 1
    mu = np.asarray(gm)[occ[0][0], occ[0][1]]
    np.testing.assert_allclose(mu[:2], [4.0, 6.0], atol=0.3)


def test_sparse_scatter_matches_dense():
    rng = np.random.default_rng(4)
    m = MapConfig(size_x=40, size_y=40, resolution=2.0, min_points_per_cell=10)
    geom = G.GridGeom.from_config(m)
    centers = [(-10.0, -10.0, 50.0), (0.9, 0.9, 80.0), (2.5, 0.2, 90.0),
               (20.0, 14.0, 70.0), (1.1, 1.1, 82.0)]  # last collides with #2
    cells = make_cells(rng, centers)
    sg = G.scatter_sparse(geom, G.empty_sparse(geom, 16), cells, jnp.ones(5, bool))
    dense = G.scatter_cells(geom, G.empty_grid(geom), cells, jnp.ones(5, bool))
    # 4 distinct grid slots allocated (two centers collide)
    assert int(sg.count) == 4
    # every allocated slot's stats match the dense grid's cell
    mu = C.mean(sg.stats)
    for slot in range(int(sg.count)):
        ix, iy, _ = G.cell_index(geom, mu[slot:slot + 1, :2])
        assert int(sg.index[int(iy[0]), int(ix[0])]) == slot
        np.testing.assert_allclose(
            float(sg.stats.n[slot]), float(dense.n[int(iy[0]), int(ix[0])]))
        np.testing.assert_allclose(
            np.asarray(sg.stats.ss[slot]),
            np.asarray(dense.ss[int(iy[0]), int(ix[0])]), rtol=1e-5)
    assert float(jnp.sum(sg.stats.n)) == 100.0


def test_sparse_window_neighbors_matches_dense():
    rng = np.random.default_rng(5)
    m = MapConfig(size_x=40, size_y=40, resolution=2.0, min_points_per_cell=10)
    geom = G.GridGeom.from_config(m)
    centers = [(-10.0, -10.0, 50.0), (0.0, 0.0, 80.0), (2.5, 0.0, 90.0),
               (20.0, 14.0, 70.0)]
    cells = make_cells(rng, centers)
    sg = G.scatter_sparse(geom, G.empty_sparse(geom, 16), cells, jnp.ones(4, bool))
    tm, tc, tv = G.derive_sparse_fields(sg, m.min_points_per_cell, CellConfig())
    q_mu = jnp.asarray([[1.0, 0.2, 85.0], [-30.0, 30.0, 50.0]])
    q_cov = jnp.broadcast_to(jnp.eye(3) * 0.2, (2, 3, 3))
    nb = G.window_neighbors_sparse(
        geom, sg.index, tm, tc, tv, q_mu, q_cov, jnp.ones(2, bool), k=2, radius=2
    )
    assert bool(nb.valid[0, 0]) and bool(nb.valid[0, 1])
    got = sorted(np.asarray(nb.mean)[0, :, 0].tolist())
    assert abs(got[0] - 0.0) < 0.5 and abs(got[1] - 2.5) < 0.5
    assert not bool(nb.valid[1, 0])


def test_sparse_transform_rekeys():
    m = MapConfig(size_x=20, size_y=20, resolution=2.0, min_points_per_cell=5)
    geom = G.GridGeom.from_config(m)
    rng = np.random.default_rng(6)
    cells = make_cells(rng, [(4.0, 0.0, 30.0)], n_pts=12, spread=0.2)
    sg = G.scatter_sparse(geom, G.empty_sparse(geom, 8), cells, jnp.ones(1, bool))
    out = G.transform_sparse(geom, sg, jnp.asarray([0.0, 6.0, 0.0]))
    tm, _, tv = G.derive_sparse_fields(out, m.min_points_per_cell, CellConfig())
    assert int(jnp.sum(tv)) == 1
    slot = int(np.argwhere(np.asarray(tv))[0][0])
    np.testing.assert_allclose(np.asarray(tm)[slot, :2], [4.0, 6.0], atol=0.3)
    ix, iy, _ = G.cell_index(geom, tm[slot:slot + 1, :2])
    assert int(out.index[int(iy[0]), int(ix[0])]) == slot


def test_sparse_overflow_drops():
    m = MapConfig(size_x=40, size_y=40, resolution=2.0, min_points_per_cell=2)
    geom = G.GridGeom.from_config(m)
    rng = np.random.default_rng(7)
    centers = [(float(4 * i - 18), 0.0, 50.0) for i in range(8)]
    cells = make_cells(rng, centers, n_pts=5)
    sg = G.scatter_sparse(geom, G.empty_sparse(geom, 4), cells, jnp.ones(8, bool))
    assert int(sg.count) == 4
    assert float(jnp.sum(sg.stats.n)) == 20.0  # only 4 cells kept
    # merging into existing slots still works at capacity
    sg2 = G.scatter_sparse(geom, sg, cells, jnp.ones(8, bool))
    assert int(sg2.count) == 4
    assert float(jnp.sum(sg2.stats.n)) == 40.0


def test_allpairs_neighbors_matches_window():
    rng = np.random.default_rng(3)
    centers = [(0.0, 0.0, 50.0), (3.0, 1.0, 60.0), (30.0, 0.0, 70.0)]
    cells = make_cells(rng, centers)
    mu, cov = C.mean_cov(cells)
    valid = jnp.ones(3, bool)
    q_mu = jnp.asarray([[0.5, 0.2, 55.0]])
    q_cov = jnp.broadcast_to(jnp.eye(3) * 0.2, (1, 3, 3))
    nb = G.allpairs_neighbors(mu, cov, valid, q_mu, q_cov, jnp.ones(1, bool),
                              k=2, linf_cutoff=5.0)
    got = sorted(np.asarray(nb.mean)[0, :, 0].tolist())
    assert bool(nb.valid[0, 0]) and bool(nb.valid[0, 1])
    assert abs(got[0]) < 0.5 and abs(got[1] - 3.0) < 0.5
    # the far cell is outside the cutoff: with k=3 it must be invalid
    nb3 = G.allpairs_neighbors(mu, cov, valid, q_mu, q_cov, jnp.ones(1, bool),
                               k=3, linf_cutoff=5.0)
    assert int(np.sum(np.asarray(nb3.valid))) == 2
