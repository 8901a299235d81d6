"""Barron's general adaptive robust loss with GNC, as IRLS weights.

Replicates ``ceres::BarronLoss`` (``RS/include/ndt_registration/
ceres_loss_functions.h:27-48``, ``ceres_loss_functions.cpp:19-39``): the GNC
control parameter mu is folded into the scale, b = mu * a^2, c = 1/b, and the
three closed forms are

    alpha >= 2:        rho(s) = s
    |alpha| <= 0.05:   rho(s) = b log(1 + s c)                    (Cauchy)
    otherwise:         rho(s) = b |a-2|/a ((s 2c/|a-2| + 1)^(a/2) - 1)

with s the SQUARED residual (Ceres convention).  rho'(s) is exactly the IRLS
weight of the Gauss-Newton step, which is how the batched solver applies the
loss (``solver.py``).  The GNC mu schedule follows
``Matcher::estimateTransformCeres`` (``ndt_matcher.cpp:386-397``).

``alpha`` (loss_function_convexity) is a static config value, so the branch is
resolved at trace time.
"""

from __future__ import annotations

import jax.numpy as jnp


def rho(s, scale: float, alpha: float, mu):
    """Robust loss value. s: squared residuals (array), mu: traced scalar."""
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


def weight(s, scale: float, alpha: float, mu):
    """IRLS weight rho'(s) (matches the closed-form derivatives in
    ``ceres_loss_functions.cpp:19-39``)."""
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


def welsch_rho(s, scale: float, mu: float = 1.0):
    """Welsch loss (``ceres_loss_functions.cpp:10-17``, present in the
    reference but unused by default): rho(s) = b (1 - exp(-s/b)), b = mu a^2."""
    b = mu * scale * scale
    return b * (1.0 - jnp.exp(-s / b))


def welsch_weight(s, scale: float, mu: float = 1.0):
    b = mu * scale * scale
    return jnp.exp(-s / b)


def gnc_mu_init(max_sq_residual, scale: float, gnc_steps: int, divisor: float):
    """Initial GNC control parameter (``ndt_matcher.cpp:387-389``):
    mu = min(2 * max_r^2 / scale^2, divisor^(gnc_steps-1))."""
    mu = 2.0 * max_sq_residual / (scale * scale)
    return jnp.minimum(mu, divisor ** (gnc_steps - 1))


def gnc_continue(mu, divisor: float):
    """Loop condition of the GNC schedule (``ndt_matcher.cpp:397``):
    iterate while mu > 1/sqrt(divisor) (mu has already been divided)."""
    return mu > 1.0 / jnp.sqrt(divisor)
