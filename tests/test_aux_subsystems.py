"""Tests for auxiliary subsystems: pNDT covariance, Welsch loss, prior
factor, checkpoint/resume, profiling, visualization exports, Oxford decode."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from randt_slam_tpu.ndt import cells as C


# ---------------------------------------------------------------- pNDT


def test_pndt_covariance_matches_closed_form():
    """from_points with polar/beam_cov folds mean(J Sigma J^T) into the
    derived covariance (``ndt_cell.cpp:68-82``)."""
    rng = np.random.default_rng(0)
    P = 40
    a = rng.uniform(-np.pi, np.pi, P).astype(np.float32)
    r = rng.uniform(5.0, 20.0, P).astype(np.float32)
    pts = np.stack(
        [r * np.cos(a), r * np.sin(a), rng.uniform(50, 90, P)], axis=-1
    ).astype(np.float32)
    polar = np.stack([a, r], axis=-1).astype(np.float32)
    beam_cov = np.diag([0.01, 0.05, 4.0]).astype(np.float32)
    ids = np.zeros(P, np.int32)
    mask = np.ones(P, bool)

    stats = C.from_points(jnp.asarray(pts), jnp.asarray(mask),
                          jnp.asarray(ids), 1,
                          polar=jnp.asarray(polar), beam_cov=beam_cov)
    mu, cov = C.mean_cov(stats, use_pndt=True, intensity_jitter=0.0)

    # closed form: sample covariance + mean of per-point sensor covariances
    mean_np = pts.mean(axis=0)
    d = pts - mean_np
    sample = d.T @ d / P
    Js = np.zeros((P, 3, 3))
    Js[:, 0, 0] = -r * np.sin(a)
    Js[:, 0, 1] = np.cos(a)
    Js[:, 1, 0] = r * np.cos(a)
    Js[:, 1, 1] = np.sin(a)
    Js[:, 2, 2] = 1.0
    pcov = np.einsum("pij,jk,plk->pil", Js, beam_cov, Js).mean(axis=0)
    np.testing.assert_allclose(np.asarray(mu[0]), mean_np, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cov[0]), sample + pcov,
                               rtol=2e-3, atol=2e-3)


def test_pndt_skips_eigen_regularization():
    """With use_pndt the reference's eigenvalue floor is not applied
    (``ndt_cell.cpp:102``): a degenerate-but-sensor-padded cell keeps its
    small eigenvalue (plus jitter only)."""
    # colinear points -> rank-deficient sample covariance
    x = np.linspace(0, 1, 10, dtype=np.float32)
    pts = np.stack([x, np.zeros_like(x), np.full_like(x, 60.0)], -1)
    ids = np.zeros(10, np.int32)
    stats = C.from_points(jnp.asarray(pts), jnp.ones(10, bool),
                          jnp.asarray(ids), 1)
    _, cov_reg = C.mean_cov(stats, eig_floor_ratio=0.001)
    _, cov_pndt = C.mean_cov(stats, use_pndt=True, intensity_jitter=1e-6)
    # regularized path floors lambda_min; pNDT path leaves ~0 (+jitter)
    assert float(cov_pndt[0, 1, 1]) < float(cov_reg[0, 1, 1])
    assert abs(float(cov_pndt[0, 1, 1]) - 1e-6) < 1e-7


# ------------------------------------------------------- Welsch / prior


def test_welsch_loss_closed_form():
    from randt_slam_tpu.registration import barron

    s = jnp.asarray([0.0, 0.5, 4.0])
    a = 1.3
    b = a * a
    rho = barron.welsch_rho(s, a)
    np.testing.assert_allclose(
        np.asarray(rho), b * (1.0 - np.exp(-np.asarray(s) / b)), rtol=1e-6
    )
    w = barron.welsch_weight(s, a)
    np.testing.assert_allclose(np.asarray(w), np.exp(-np.asarray(s) / b),
                               rtol=1e-6)
    # rho'(s) == weight
    g = jax.vmap(jax.grad(lambda t: barron.welsch_rho(t, a)))(s)
    np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-5)


def test_prior_residual_whitens_and_normalizes():
    from randt_slam_tpu.registration import residuals as R

    sqrtI = jnp.diag(jnp.arange(1.0, 10.0))
    state = jnp.zeros(9).at[R.TH].set(3.0)
    prior = jnp.zeros(9).at[R.TH].set(-3.0)
    r = R.prior_residual(state, prior, sqrtI)
    # 3 - (-3) = 6 -> normalized to 6 - 2pi, scaled by sqrtI[TH,TH]
    expect = (6.0 - 2.0 * np.pi) * float(sqrtI[R.TH, R.TH])
    np.testing.assert_allclose(float(r[R.TH]), expect, rtol=1e-5)
    assert float(jnp.sum(jnp.abs(r))) - abs(expect) < 1e-5


# ------------------------------------------------------ checkpoint / resume


def test_checkpoint_roundtrip(tmp_path):
    from randt_slam_tpu.pipeline import frontend as F
    from randt_slam_tpu.utils import checkpoint as CK
    from __graft_entry__ import _tiny_cfg

    cfg = _tiny_cfg()
    carry = F.init_carry(cfg)
    carry = carry._replace(cur_pose=carry.cur_pose + 1.5)
    path = str(tmp_path / "ck.npz")
    CK.save_carry(path, carry, extra={"frame": 17})
    restored = CK.load_carry(path, carry)
    leaves0 = jax.tree.leaves(carry)
    leaves1 = jax.tree.leaves(restored)
    assert len(leaves0) == len(leaves1)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(CK.load_extra(path)["frame"]) == 17


# ------------------------------------------------------------- profiling


def test_profiler_accumulates():
    from randt_slam_tpu.utils.profiling import Profiler

    p = Profiler(sync=False)
    for _ in range(3):
        with p.stage("x"):
            pass
    rep = p.report()
    assert rep["x"]["count"] == 3
    assert rep["x"]["total_s"] >= rep["x"]["max_s"]


# ------------------------------------------------------------------ viz


def test_ellipse_parameters_match_eigh():
    from randt_slam_tpu.io import viz

    rng = np.random.default_rng(1)
    A = rng.normal(size=(5, 2, 2))
    covs = A @ np.swapaxes(A, -1, -2) + 0.1 * np.eye(2)
    a, b, ang = viz.ellipse_parameters(covs, n_sigma=3.0)
    w = np.linalg.eigvalsh(covs)
    np.testing.assert_allclose(np.sort(np.stack([a, b], -1), axis=-1),
                               3.0 * np.sqrt(np.sort(w, axis=-1)), rtol=1e-6)
    assert a.shape == (5,) and np.all(a >= b)


def test_write_pgm_and_nd_export(tmp_path):
    from randt_slam_tpu.io import viz

    grid = np.array([[-1.0, 0.0], [50.0, 100.0]], np.float32)
    p = str(tmp_path / "m.pgm")
    viz.write_pgm(p, grid)
    data = open(p, "rb").read()
    assert data.startswith(b"P5\n2 2\n255\n")
    assert len(data) == len(b"P5\n2 2\n255\n") + 4

    mean = np.zeros((3, 3), np.float32)
    cov = np.tile(np.eye(3, dtype=np.float32), (3, 1, 1))
    valid = np.array([True, False, True])
    q = str(tmp_path / "nd.npz")
    viz.export_normal_distributions(q, mean, cov, valid)
    back = np.load(q)
    assert back["mean_x"].shape == (2,)
    np.testing.assert_allclose(back["cov_xx"], 1.0)


def test_rainbow_color_range():
    from randt_slam_tpu.io import viz

    c = viz.rainbow_color(np.linspace(0, 1, 11))
    assert c.shape == (11, 3)
    assert np.all(c >= 0.0) and np.all(c <= 1.0)
    # endpoints differ (red-ish vs blue-ish)
    assert abs(c[0] - c[-1]).sum() > 0.5


# ---------------------------------------------------------------- oxford


def test_decode_radar_png_header_and_power():
    from randt_slam_tpu.io import oxford

    A, Rb = oxford.OXFORD_N_AZIMUTHS, 64
    raw = np.zeros((A, oxford.OXFORD_HEADER_BYTES + Rb), np.uint8)
    ts = (np.arange(A, dtype=np.int64) + 1_600_000_000_000_000)
    raw[:, :8] = ts.view(np.uint8).reshape(A, 8)
    sweep = np.linspace(0, 2799, A).astype(np.uint16)
    raw[:, 8:10] = sweep.view(np.uint8).reshape(A, 2)
    rng = np.random.default_rng(2)
    power = rng.integers(0, 255, (A, Rb), dtype=np.uint8)
    raw[:, oxford.OXFORD_HEADER_BYTES:] = power

    p, az, st = oxford.decode_radar_png(raw)
    np.testing.assert_allclose(p, power.astype(np.float32))
    np.testing.assert_allclose(st, ts * 1e-6)
    assert az[0] < az[-1] and az.min() >= -np.pi and az.max() <= np.pi

    # downsampling max-pools range bins
    p2, _, _ = oxford.decode_radar_png(raw, downsample_bins=4)
    assert p2.shape == (A, Rb // 4)
    np.testing.assert_allclose(
        p2, power.reshape(A, -1, 4).max(axis=2).astype(np.float32)
    )


def test_load_npz_sequence_roundtrip(tmp_path):
    from randt_slam_tpu.io import oxford

    p = str(tmp_path / "seq.npz")
    np.savez(
        p,
        intensity=np.ones((4, 8, 16), np.float16),
        azimuths=np.linspace(-np.pi, np.pi, 8).astype(np.float32),
        ranges=np.arange(16, dtype=np.float32),
        stamps=np.array([100.0, 100.25, 100.5, 100.75]),
        gt_poses=np.zeros((4, 3), np.float32),
    )
    seq = oxford.load_npz_sequence(p, max_frames=3)
    assert seq.intensity.shape == (3, 8, 16)
    assert seq.intensity.dtype == np.float32
    np.testing.assert_allclose(seq.stamps, [0.0, 0.25, 0.5])
    assert seq.gt_poses.shape == (3, 3)


def test_render_map_png(tmp_path):
    """Offline RViz-view renderer (OGM + ellipses + trajectories) writes a
    real PNG for any subset of inputs (``viz.render_map_png``)."""
    from randt_slam_tpu.io import viz

    rng = np.random.default_rng(0)
    C = 20
    mean = np.concatenate(
        [rng.uniform(-20, 20, (C, 2)), rng.uniform(0, 90, (C, 1))], 1)
    A = rng.normal(size=(C, 3, 3)) * 0.3
    cov = A @ np.transpose(A, (0, 2, 1)) + np.eye(3) * 0.05
    valid = rng.random(C) > 0.2
    traj = np.stack([np.linspace(-15, 15, 30),
                     np.sin(np.linspace(0, 3, 30)) * 5, np.zeros(30)], 1)
    ogm = rng.integers(-1, 100, (40, 60)).astype(np.float32)
    p = tmp_path / "map.png"
    viz.render_map_png(str(p), node_pose=traj, odom=traj + 0.5,
                       ndt_mean=mean, ndt_cov=cov, ndt_valid=valid,
                       ogm=ogm, ogm_extent=(-30, 30, -20, 20), title="t")
    assert p.exists() and p.stat().st_size > 10_000
    assert open(p, "rb").read(8)[1:4] == b"PNG"
    # every input optional: trajectory-only render also succeeds
    p2 = tmp_path / "traj_only.png"
    viz.render_map_png(str(p2), node_pose=traj)
    assert p2.exists() and p2.stat().st_size > 1_000
