"""Pallas-fused NDT linearization for the sliding-window estimator.

The LM/GNC solver loop of ``registration/matcher.estimate_window`` is
LATENCY-bound, not FLOP-bound (SPEED.md §0): each iteration used to launch
~50 tiny XLA ops (forward-mode Jacobian chains, einsums, robust-weight
elementwise ops) over arrays of only ~2k pairs per window slot.  This module
collapses one whole linearization — residual, analytic Jacobian, Barron IRLS
weights, and the per-slot 3x3 JᵀWJ / Jᵀ W r accumulation — into ONE Pallas
kernel, plus a residual-only variant for the LM accept test.

Math mirrored exactly (same formulas, hand-differentiated):

* residual: intensity-augmented D2D ``ndt_residual_sq``
  (``registration/residuals.py:99-139``; reference
  ``ceres_residuals.h:486-518``), r = sqrt(max(r^2, eps)).
* Jacobian w.r.t. the slot pose (tx, ty, theta) of r = sqrt(d^T S^-1 d):
    dr2/dt    = 2 q_xy,           q = S^-1 d
    dr2/dth   = 2 q . d_theta  -  q^T (dS/dth) q
  with d_theta = (-v, u, 0), u = c mx - s my, v = s mx + c my, and dS/dth the
  z-rotation derivative of R Sigma_m R^T (analytic counterpart of the
  reference's hand-written Jacobians, ``ceres_residuals.h:257-305``).
* Barron rho / rho' with GNC mu (``barron.py``; ``ceres_loss_functions.cpp``).

Data layout: pairs are packed channels-first — (W, ch, N) with N = F*C*K
pairs in the 128-wide lane dimension — so every per-pair op is a full-width
VPU op.  Covariances carry their 6 unique components [00, 01, 02, 11, 12, 22].
The window size W is tiny (3 for Oxford) and static, so the kernel unrolls
the slot loop instead of using a grid (full-array blocks sidestep the
(8, 128)-divisibility rule for sub-blocks).

Only the 3-D (``use_intensity_as_dimension: true``) residual is implemented
in-kernel (the Oxford configuration); the 2-D variant falls back to the
jacfwd path in ``matcher.py``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SYM6 = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))


def pack_pairs(m_mean, m_cov, a_mean, a_cov, valid):
    """(W, ..., 3)/(W, ..., 3, 3)/(W, ...) bool -> channels-first pack.

    Returns (m_mean3, m_cov6, a_mean3, a_cov6, valid1) each (W, ch, N) f32.
    """
    W = m_mean.shape[0]
    mm = m_mean.reshape(W, -1, 3)
    am = a_mean.reshape(W, -1, 3)
    mc = m_cov.reshape(W, -1, 3, 3)
    ac = a_cov.reshape(W, -1, 3, 3)
    v = valid.reshape(W, -1)

    def sym(c):
        return jnp.stack([c[..., i, j] for (i, j) in SYM6], axis=1)

    return (
        jnp.swapaxes(mm, 1, 2),           # (W, 3, N)
        sym(mc),                           # (W, 6, N)
        jnp.swapaxes(am, 1, 2),           # (W, 3, N)
        sym(ac),                           # (W, 6, N)
        v[:, None, :].astype(jnp.float32),  # (W, 1, N)
    )


def _pair_terms(c, s, tx, ty, mm, mc, am, ac):
    """Shared per-pair math (vectors over N lanes).

    Returns (r2, q0, q1, q2, dth0, dth1, dS) with dS the 5 nonzero
    components of dS/dtheta.  Formulas mirror ``ndt_residual_sq`` exactly.
    """
    mx, my, mi = mm[0], mm[1], mm[2]
    a, b, e, cc, f, g = mc[0], mc[1], mc[2], mc[3], mc[4], mc[5]
    fx, fy, fi = am[0], am[1], am[2]
    f00, f01, f02, f11, f12, f22 = ac[0], ac[1], ac[2], ac[3], ac[4], ac[5]

    u = c * mx - s * my
    v = s * mx + c * my
    d0 = u + tx - fx
    d1 = v + ty - fy
    d2 = mi - fi

    # S = R Sigma_m R^T + Sigma_f (same expansion as residuals.py:118-129)
    r00 = c * (c * a - s * b) - s * (c * b - s * cc)
    r01 = c * (s * a + c * b) - s * (s * b + c * cc)
    r11 = s * (s * a + c * b) + c * (s * b + c * cc)
    r02 = c * e - s * f
    r12 = s * e + c * f
    s00 = r00 + f00
    s01 = r01 + f01
    s02 = r02 + f02
    s11 = r11 + f11
    s12 = r12 + f12
    s22 = g + f22

    # q = S^-1 d via the adjugate (cells.solve3 formulas)
    A = s11 * s22 - s12 * s12
    B = s02 * s12 - s01 * s22
    C = s01 * s12 - s11 * s02
    det = s00 * A + s01 * B + s02 * C
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    D = s00 * s22 - s02 * s02
    E = s01 * s02 - s00 * s12
    F = s00 * s11 - s01 * s01
    q0 = (A * d0 + B * d1 + C * d2) / det
    q1 = (B * d0 + D * d1 + E * d2) / det
    q2 = (C * d0 + E * d1 + F * d2) / det
    r2 = d0 * q0 + d1 * q1 + d2 * q2

    # dS/dtheta = P + P^T, P = (R' Sigma_m) R^T
    n00 = -s * a - c * b
    n01 = -s * b - c * cc
    n02 = -s * e - c * f
    n10 = c * a - s * b
    n11 = c * b - s * cc
    n12 = c * e - s * f
    p00 = n00 * c - n01 * s
    p01 = n00 * s + n01 * c
    p10 = n10 * c - n11 * s
    p11 = n10 * s + n11 * c
    dS00 = 2.0 * p00
    dS01 = p01 + p10
    dS02 = n02
    dS11 = 2.0 * p11
    dS12 = n12
    return (r2, q0, q1, q2, -v, u,
            (dS00, dS01, dS02, dS11, dS12))


def _barron_weight(s, scale, alpha, mu):
    """rho'(s) with STATIC alpha (mirrors barron.weight)."""
    b = mu * scale * scale
    c = 1.0 / b
    if alpha >= 2.0:
        return jnp.ones_like(s)
    if abs(alpha) <= 0.05:
        return jnp.maximum(1.0 / (1.0 + s * c), jnp.finfo(s.dtype).tiny)
    factor = abs(alpha - 2.0)
    exponent = 0.5 * alpha
    pre = b * factor / alpha
    times_s = 2.0 * c / factor
    return pre * exponent * jnp.power(s * times_s + 1.0, exponent - 1.0) * times_s


def _barron_rho(s, scale, alpha, mu):
    b = mu * scale * scale
    c = 1.0 / b
    if alpha >= 2.0:
        return s
    if abs(alpha) <= 0.05:
        return b * jnp.log1p(s * c)
    factor = abs(alpha - 2.0)
    exponent = 0.5 * alpha
    pre = b * factor / alpha
    times_s = 2.0 * c / factor
    return pre * (jnp.power(s * times_s + 1.0, exponent) - 1.0)


def _linearize_kernel(W, scale, alpha, eps,
                      pose_ref, sc_ref, mm_ref, mc_ref, am_ref, ac_ref,
                      v_ref, H_ref, g_ref, rho_ref):
    """All window slots unrolled: H (W,3,3), g (W,1,3), rho_sum (W,1) SMEM."""
    mu = sc_ref[0, 0]
    ndt_scale = sc_ref[0, 1]
    for w in range(W):  # static unroll — W is 3
        tx = pose_ref[w, 0]
        ty = pose_ref[w, 1]
        c = pose_ref[w, 2]
        s = pose_ref[w, 3]
        r2, q0, q1, q2, dth_d0, dth_d1, dS = _pair_terms(
            c, s, tx, ty, mm_ref[w], mc_ref[w], am_ref[w], ac_ref[w])
        dS00, dS01, dS02, dS11, dS12 = dS
        w_valid = v_ref[w][0]

        r = jnp.sqrt(jnp.maximum(r2, eps))
        qdSq = (q0 * (dS00 * q0 + dS01 * q1 + dS02 * q2)
                + q1 * (dS01 * q0 + dS11 * q1 + dS12 * q2)
                + q2 * (dS02 * q0 + dS12 * q1))
        inv2r = 0.5 / r
        # matches jacfwd through sqrt(max(r2, eps)): zero grad when clamped
        live = (r2 > eps).astype(r.dtype)
        J0 = 2.0 * q0 * inv2r * live
        J1 = 2.0 * q1 * inv2r * live
        J2 = (2.0 * (q0 * dth_d0 + q1 * dth_d1) - qdSq) * inv2r * live

        wgt = ndt_scale * _barron_weight(r * r, scale, alpha, mu) * w_valid
        wr = wgt * r

        H00 = jnp.sum(wgt * J0 * J0)
        H01 = jnp.sum(wgt * J0 * J1)
        H02 = jnp.sum(wgt * J0 * J2)
        H11 = jnp.sum(wgt * J1 * J1)
        H12 = jnp.sum(wgt * J1 * J2)
        H22 = jnp.sum(wgt * J2 * J2)
        H_ref[w] = jnp.stack([
            jnp.stack([H00, H01, H02]),
            jnp.stack([H01, H11, H12]),
            jnp.stack([H02, H12, H22]),
        ])
        g_ref[w, 0] = jnp.stack(
            [jnp.sum(wr * J0), jnp.sum(wr * J1), jnp.sum(wr * J2)])
        rho_ref[w, 0] = jnp.sum(_barron_rho(r * r, scale, alpha, mu)
                                * w_valid)


def _cost_kernel(W, scale, alpha, eps,
                 pose_ref, sc_ref, mm_ref, mc_ref, am_ref, ac_ref,
                 v_ref, rho_ref, r2max_ref):
    """Residual-only pass: per-slot robust-cost sum + max squared residual."""
    mu = sc_ref[0, 0]
    for w in range(W):
        tx = pose_ref[w, 0]
        ty = pose_ref[w, 1]
        c = pose_ref[w, 2]
        s = pose_ref[w, 3]
        r2, _, _, _, _, _, _ = _pair_terms(
            c, s, tx, ty, mm_ref[w], mc_ref[w], am_ref[w], ac_ref[w])
        w_valid = v_ref[w][0]
        r = jnp.sqrt(jnp.maximum(r2, eps))
        sq = r * r
        rho_ref[w, 0] = jnp.sum(_barron_rho(sq, scale, alpha, mu) * w_valid)
        r2max_ref[w, 0] = jnp.max(jnp.where(w_valid > 0.0, sq, 0.0))


def _common_in_specs():
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    # pose (W, 4) SMEM, scalars (1, 2) SMEM, pair channels VMEM (full arrays)
    return [sm, sm, vm, vm, vm, vm, vm]


def _pose_inputs(poses, mu, ndt_scale):
    """(W, 3) poses -> (W, 4) [tx, ty, cos, sin]; scalars -> (1, 2)."""
    th = poses[:, 2]
    pose4 = jnp.stack(
        [poses[:, 0], poses[:, 1], jnp.cos(th), jnp.sin(th)], axis=1)
    sc = jnp.stack([jnp.asarray(mu, jnp.float32).reshape(()),
                    jnp.asarray(ndt_scale, jnp.float32).reshape(())]
                   ).reshape(1, 2)
    return pose4, sc


@partial(jax.jit, static_argnames=("scale", "alpha", "eps", "interpret"))
def linearize(poses, mu, ndt_scale, packed,
              scale: float, alpha: float, eps: float = 1e-12,
              interpret: bool = False):
    """Fused per-slot normal-equation blocks.

    poses (W, 3); packed = pack_pairs(...) with N pairs/slot.
    Returns (H (W, 3, 3), g (W, 3), rho_sum ()).
    """
    mm, mc, am, ac, v = packed
    W = mm.shape[0]
    f32 = jnp.float32
    pose4, sc = _pose_inputs(poses, mu, ndt_scale)
    H, g, rho = pl.pallas_call(
        partial(_linearize_kernel, W, scale, alpha, eps),
        in_specs=_common_in_specs(),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((W, 3, 3), f32),
            jax.ShapeDtypeStruct((W, 1, 3), f32),
            jax.ShapeDtypeStruct((W, 1), f32),
        ),
        interpret=interpret,
    )(pose4, sc, mm, mc, am, ac, v)
    return H, g.reshape(W, 3), jnp.sum(rho)


@partial(jax.jit, static_argnames=("scale", "alpha", "eps", "interpret"))
def robust_cost(poses, mu, packed,
                scale: float, alpha: float, eps: float = 1e-12,
                interpret: bool = False):
    """Fused residual-only pass.

    Returns (rho_sum (), r2max ()) over all slots' valid pairs."""
    mm, mc, am, ac, v = packed
    W = mm.shape[0]
    f32 = jnp.float32
    pose4, sc = _pose_inputs(poses, mu, jnp.float32(0.0))
    rho, r2max = pl.pallas_call(
        partial(_cost_kernel, W, scale, alpha, eps),
        in_specs=_common_in_specs(),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((W, 1), f32),
            jax.ShapeDtypeStruct((W, 1), f32),
        ),
        interpret=interpret,
    )(pose4, sc, mm, mc, am, ac, v)
    return jnp.sum(rho), jnp.max(r2max)
