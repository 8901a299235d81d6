"""Kernel-level tests: segment moment reductions and the structured
window linearizer (must match the dense jacfwd formulation)."""

import jax
import jax.numpy as jnp
import numpy as np

from randt_slam_tpu.ndt import cells as C
from randt_slam_tpu.ops.segment_moments import segment_moments, segment_topk_moments
from randt_slam_tpu.registration import barron


def test_segment_moments_matches_segment_sum():
    rng = np.random.default_rng(0)
    P, S, CH = 5000, 700, 13
    vals = jnp.asarray(rng.normal(0, 10, (P, CH)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, S + 1, P).astype(np.int32))  # some invalid
    ref = jax.ops.segment_sum(vals, jnp.where(ids < S, ids, S),
                              num_segments=S + 1)[:S]
    got = segment_moments(vals, ids, S)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-6,
                               atol=1e-3)


def test_segment_topk_matches_full_then_compact():
    rng = np.random.default_rng(1)
    P, S, k = 5000, 700, 128
    pts = jnp.asarray(rng.normal(0, 30, (P, 3)).astype(np.float32))
    mask = jnp.asarray(rng.random(P) < 0.5)
    ids = jnp.asarray(rng.integers(0, S, P).astype(np.int32))
    dense = C.from_points(pts, mask, ids, S)
    old, _ = C.compact(dense, k)
    new, topi = C.from_points_compact(pts, mask, ids, S, k)
    np.testing.assert_allclose(np.asarray(old.n), np.asarray(new.n), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(old.ss), np.asarray(new.ss),
                               rtol=1e-5, atol=1e-2)


def test_structured_linearizer_matches_dense(monkeypatch):
    """The block-assembled normal equations of estimate_window must equal the
    dense jacfwd formulation to float32 tolerance (same H, g at the same
    point; the LM trajectories may then diverge chaotically, which is fine)."""
    import randt_slam_tpu.registration.solver as S
    from randt_slam_tpu.registration import matcher
    from randt_slam_tpu.io import synthetic
    from randt_slam_tpu.pipeline import frontend as F, slam
    from tests.test_odometry_e2e import small_cfg

    diffs = []
    orig = S.gnc_solve

    def spy(residual_fn, params0, active_mask, angle_mask, ndt_valid,
            aux_valid, ndt_scale, scale, alpha, gnc_steps, divisor,
            lm_max_iters, lm_tol, linearize_fn=None, **kw):
        if linearize_fn is not None:
            active_f = active_mask.astype(params0.dtype)
            n_ndt = ndt_valid.shape[0]

            def stacked(p):
                rn, ra = residual_fn(p)
                return jnp.concatenate([rn, ra])

            def dense_lin(p, mu_):
                r = stacked(p)
                J = jax.jacfwd(stacked)(p)
                rn = r[:n_ndt]
                w_ndt = ndt_scale * barron.weight(rn * rn, scale, alpha, mu_)
                w = jnp.concatenate([
                    jnp.where(ndt_valid, w_ndt, 0.0),
                    jnp.where(aux_valid, 1.0, 0.0),
                ])
                Jm = J * active_f[None, :]
                JW = Jm * w[:, None]
                return Jm.T @ JW, JW.T @ r

            mu = jnp.float32(37.0)
            Hd, gd = dense_lin(params0, mu)
            Hs, gs = linearize_fn(params0, mu)
            rel_h = jnp.max(jnp.abs(Hd - Hs)) / (jnp.max(jnp.abs(Hd)) + 1e-9)
            rel_g = jnp.max(jnp.abs(gd - gs)) / (jnp.max(jnp.abs(gd)) + 1e-9)
            diffs.append((rel_h, rel_g))
        return orig(residual_fn, params0, active_mask, angle_mask, ndt_valid,
                    aux_valid, ndt_scale, scale, alpha, gnc_steps, divisor,
                    lm_max_iters, lm_tol, linearize_fn=linearize_fn)

    monkeypatch.setattr(S, "gnc_solve", spy)
    monkeypatch.setattr(matcher.solver, "gnc_solve", spy)

    from randt_slam_tpu.ndt import grid as G

    cfg = small_cfg()
    seq = synthetic.generate(seed=0, n_frames=5, n_azimuths=128, n_bins=256,
                             max_range=40.0, speed=3.0, dt=0.25, n_walls=40)
    frames = slam.frames_from_arrays(seq.intensity, seq.azimuths, seq.ranges,
                                     seq.stamps)
    s2b = jnp.zeros(3)
    geom = G.GridGeom.from_config(cfg.ndt_map)
    W = cfg.matcher.smoothing_steps
    Cc = cfg.capacity.max_scan_cells

    # Build a submap from frame 0 and a scan window from frames 1..W,
    # then call estimate_window directly (concrete, outside jit) so the spy
    # sees real arrays.
    scans = [F.build_scan_cells(cfg, jax.tree.map(lambda a: a[i], frames), s2b)[0]
             for i in range(W + 1)]
    sub = G.scatter_sparse(geom, G.empty_sparse(geom, cfg.capacity.max_submap_cells),
                           scans[0].stats, scans[0].valid)
    tm, tc, tv = G.derive_sparse_fields(sub, cfg.ndt_map.min_points_per_cell,
                                        cfg.ndt_map.cell)
    empty = G.empty_sparse(geom, cfg.capacity.max_submap_cells)
    em, ec, ev = G.derive_sparse_fields(empty, cfg.ndt_map.min_points_per_cell,
                                        cfg.ndt_map.cell)
    fixed = matcher.FixedMaps(
        index=(sub.index, empty.index),
        mean=jnp.stack([tm, em]), cov=jnp.stack([tc, ec]),
        valid=jnp.stack([tv, ev]),
        use=jnp.asarray([True, False]))
    sw = matcher.ScanWindow(
        mean=jnp.stack([s.mean for s in scans[1:]]),
        cov=jnp.stack([s.cov for s in scans[1:]]),
        valid=jnp.stack([s.valid for s in scans[1:]]))
    states = jnp.zeros((W + 1, 9), jnp.float32)
    stamps = jnp.arange(W + 1, dtype=jnp.float32) * 0.25
    matcher.estimate_window(cfg, states, stamps, jnp.ones(W + 1, bool),
                            jnp.zeros(W, jnp.float32), sw, fixed,
                            jnp.zeros(3, jnp.float32))
    assert len(diffs) == 1
    for rel_h, rel_g in diffs:
        assert float(rel_h) < 1e-5
        assert float(rel_g) < 1e-5
