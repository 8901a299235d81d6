"""Residual functions of the sliding-window estimator, as pure JAX.

State layout (per state, 9 floats) — the scalar representation of
``RS/include/ndt_slam/trajectory_representation.h:12-22``:

    [x, y, theta, vx, vy, omega, ax, ay, imu_bias]

position/heading in the submap frame, velocity/acceleration in the robot
frame (see the ``motion_sqrtI`` comment in ``parameters_oxford.yaml``).

Each residual mirrors its Ceres counterpart in
``RS/include/ndt_registration/ceres_residuals.h``:
  * :func:`predict_state`      <- ``predict``          (:25-55)
  * :func:`motion_residual`    <- ``MotionModelFactor`` (:554-619)
  * :func:`imu_residual`       <- ``RotationalResidual`` (:307-336)
  * :func:`ndt_residual_sq`    <- ``NDTFrameToMapIntensityFactorResidual``
                                  (:486-518; squared form, the solver takes
                                  the square root once per pair)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry import normalize_angle
from ..ndt import cells as C

# State vector slot indices.
X, Y, TH, VX, VY, OM, AX, AY, BIAS = range(9)
STATE_DIM = 9
MIN_DT = 0.2  # duplicate-stamp guard (``ceres_residuals.h:38``)


def predict_state(state, raw_dt):
    """Constant-velocity/acceleration kinematic prediction.

    Matches ``predict`` (``ceres_residuals.h:25-55``) including the
    dt >= 0.2 s clamp and the midpoint-heading rotation of the body-frame
    displacement.  Broadcasts over leading axes; state (..., 9).
    """
    dt = jnp.maximum(raw_dt, MIN_DT)
    rot_mid = normalize_angle(state[..., TH] + 0.5 * dt * state[..., OM])
    sy, cy = jnp.sin(rot_mid), jnp.cos(rot_mid)
    dx = state[..., VX] * dt + 0.5 * state[..., AX] * dt * dt
    dy = state[..., VY] * dt + 0.5 * state[..., AY] * dt * dt
    out = state
    out = out.at[..., X].add(cy * dx - sy * dy)
    out = out.at[..., Y].add(sy * dx + cy * dy)
    out = out.at[..., TH].set(normalize_angle(state[..., TH] + dt * state[..., OM]))
    out = out.at[..., VX].add(dt * state[..., AX])
    out = out.at[..., VY].add(dt * state[..., AY])
    return out


def motion_residual(s0, s1, raw_dt, sqrt_information):
    """8-dim motion-model residual (``ceres_residuals.h:554-619``):
    sqrtI @ [pos_1 - pos_pred; normalize(th_1 - th_pred); vel_1 - vel_pred;
    om_1 - om_pred; acc_1 - acc_pred].  sqrt_information already includes the
    covariance scaling factor (``ndt_matcher.cpp:66``)."""
    pred = predict_state(s0, raw_dt)
    r = jnp.stack(
        [
            s1[..., X] - pred[..., X],
            s1[..., Y] - pred[..., Y],
            normalize_angle(s1[..., TH] - pred[..., TH]),
            s1[..., VX] - pred[..., VX],
            s1[..., VY] - pred[..., VY],
            s1[..., OM] - pred[..., OM],
            s1[..., AX] - pred[..., AX],
            s1[..., AY] - pred[..., AY],
        ],
        axis=-1,
    )
    return jnp.einsum("ij,...j->...i", sqrt_information, r)


def imu_residual(s0, s1, raw_dt, rot_meas, weight_imu, weight_bias):
    """2-dim IMU rotation + bias-walk residual (``ceres_residuals.h:307-336``):
    [w * (rot_meas - normalize(th1 - th0 + bias1 * dt)); w_b * (bias1 - bias0)].
    NOTE: the reference does NOT clamp dt here (it passes the raw difference,
    ``ndt_matcher.cpp:147``)."""
    r0 = weight_imu * (
        rot_meas - normalize_angle(s1[..., TH] - s0[..., TH] + s1[..., BIAS] * raw_dt)
    )
    r1 = weight_bias * (s1[..., BIAS] - s0[..., BIAS])
    return jnp.stack([r0, r1], axis=-1)


def prior_residual(state, prior_state, sqrt_information):
    """9-dim prior factor (``PriorFactor``, ``ceres_residuals.h:681-738``;
    present in the reference but unused by default): whitened difference of
    the full state (pose with angle normalization, velocities, accelerations,
    IMU bias)."""
    r = state - prior_state
    r = r.at[..., TH].set(normalize_angle(r[..., TH]))
    return jnp.einsum("ij,...j->...i", sqrt_information, r)


def ndt_residual_sq(pose, m_mean, m_cov, f_mean, f_cov):
    """Squared intensity-augmented D2D residual.

    r^2 = d^T (R3 cov_m R3^T + cov_f)^{-1} d,  d = R3 mu_m + t3 - mu_f,
    with R3 the z-rotation by theta and t3 = [x, y, 0]
    (``ceres_residuals.h:486-518``).  Broadcasts pose (..., 3) against cell
    batches (..., 3)/(..., 3, 3).
    """
    th = pose[..., 2]
    c, s = jnp.cos(th), jnp.sin(th)
    mx, my, mi = m_mean[..., 0], m_mean[..., 1], m_mean[..., 2]
    dx = c * mx - s * my + pose[..., 0] - f_mean[..., 0]
    dy = s * mx + c * my + pose[..., 1] - f_mean[..., 1]
    di = mi - f_mean[..., 2]
    dx, dy, di = jnp.broadcast_arrays(dx, dy, di)
    d = jnp.stack([dx, dy, di], axis=-1)

    # R3 cov_m R3^T, with R3 = [[c,-s,0],[s,c,0],[0,0,1]], expanded by hand to
    # stay elementwise on the VPU.
    a, b, e = m_cov[..., 0, 0], m_cov[..., 0, 1], m_cov[..., 0, 2]
    cc, f = m_cov[..., 1, 1], m_cov[..., 1, 2]
    g = m_cov[..., 2, 2]
    r00 = c * (c * a - s * b) - s * (c * b - s * cc)
    r01 = c * (s * a + c * b) - s * (s * b + c * cc)
    r11 = s * (s * a + c * b) + c * (s * b + c * cc)
    r02 = c * e - s * f
    r12 = s * e + c * f
    s00, s01, s02, s11, s12, s22 = jnp.broadcast_arrays(
        r00 + f_cov[..., 0, 0], r01 + f_cov[..., 0, 1], r02 + f_cov[..., 0, 2],
        r11 + f_cov[..., 1, 1], r12 + f_cov[..., 1, 2], g + f_cov[..., 2, 2],
    )
    S = jnp.stack(
        [
            jnp.stack([s00, s01, s02], axis=-1),
            jnp.stack([s01, s11, s12], axis=-1),
            jnp.stack([s02, s12, s22], axis=-1),
        ],
        axis=-2,
    )
    sol = C.solve3(S, d)
    return jnp.einsum("...i,...i->...", d, sol)


def ndt_residual_sq_2d(pose, m_mean, m_cov, f_mean, f_cov):
    """Squared 2-D (non-intensity) D2D residual.

    ``use_intensity_as_dimension: false`` variant
    (``NDTFrameToMapFactorResidual``, ``ceres_residuals.h:421-451``):
    r^2 = d^T (R cov_m R^T + cov_f)^{-1} d over the POSITION blocks only;
    cell fields are passed 3-D and sliced here so both variants share data
    layout.
    """
    th = pose[..., 2]
    c, s = jnp.cos(th), jnp.sin(th)
    mx, my = m_mean[..., 0], m_mean[..., 1]
    dx = c * mx - s * my + pose[..., 0] - f_mean[..., 0]
    dy = s * mx + c * my + pose[..., 1] - f_mean[..., 1]

    a, b, d = m_cov[..., 0, 0], m_cov[..., 0, 1], m_cov[..., 1, 1]
    r00 = c * (c * a - s * b) - s * (c * b - s * d)
    r01 = c * (s * a + c * b) - s * (s * b + c * d)
    r11 = s * (s * a + c * b) + c * (s * b + c * d)
    s00 = r00 + f_cov[..., 0, 0]
    s01 = r01 + f_cov[..., 0, 1]
    s11 = r11 + f_cov[..., 1, 1]
    det = s00 * s11 - s01 * s01
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    return (s11 * dx * dx - 2.0 * s01 * dx * dy + s00 * dy * dy) / det


def ndt_residual(pose, m_mean, m_cov, f_mean, f_cov, eps=1e-12,
                 use_intensity: bool = True):
    """Whitened D2D residual r = sqrt(r^2), clamped away from zero for a
    finite Jacobian (Ceres divides by the residual the same way,
    ``ceres_residuals.h:240-247``).  ``use_intensity`` selects the 3-D
    intensity-augmented form (:486-518) or the 2-D position-only form
    (:421-451)."""
    if use_intensity:
        r2 = ndt_residual_sq(pose, m_mean, m_cov, f_mean, f_cov)
    else:
        r2 = ndt_residual_sq_2d(pose, m_mean, m_cov, f_mean, f_cov)
    return jnp.sqrt(jnp.maximum(r2, eps))
