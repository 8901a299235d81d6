"""Single-kernel SPD solve for the window estimator's normal equations.

The LM loop solves a damped (P, P) system with P = (W+1)*9 = 36 every
iteration.  XLA lowers ``jnp.linalg.solve`` to the generic
``LuDecompositionBlock`` + triangular-inverse custom calls — measured as the
single largest op group of the solver loop (SPEED.md §0).  At P=36 the right
tool is one Pallas kernel doing an unblocked Cholesky + forward/back
substitution entirely in VMEM: ~3P tiny vector steps inside ONE kernel launch
instead of a multi-op LAPACK pipeline per iteration.

The system must be SPD (Gauss-Newton H, Jacobi-scaled, positive damping,
identity rows on inactive params — see ``registration/solver.py``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_solve_kernel(P, A_ref, b_ref, x_ref):
    A = A_ref[:]                       # (P, P)
    b = b_ref[:]                       # (1, P)
    rows = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
    vec = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)

    # ---- Cholesky (lower), right-looking, column j per step --------------
    def chol_step(j, carry):
        A, L = carry
        colj = jnp.sum(jnp.where(cols == j, A, 0.0), axis=1,
                       keepdims=True)   # (P, 1) = A[:, j]
        ajj = jnp.sum(jnp.where(vec == j, colj[:, 0][None, :], 0.0))
        d = jax.lax.rsqrt(jnp.maximum(ajj, 1e-30))
        lcol = colj * d                 # L[:, j] for rows >= j
        lcol = jnp.where(rows[:, :1] >= j, lcol, 0.0)
        L = jnp.where(cols == j, lcol, L)
        # trailing update: A[j+1:, j+1:] -= lcol lcol^T
        upd = lcol * lcol[:, 0][None, :]        # (P, P) outer product
        A = A - jnp.where((rows > j) & (cols > j), upd, 0.0)
        return A, L

    _, L = jax.lax.fori_loop(0, P, chol_step,
                             (A, jnp.zeros_like(A)))

    # ---- forward substitution: L y = b -----------------------------------
    def fwd_step(j, y):
        Lrow = jnp.sum(jnp.where(rows == j, L, 0.0), axis=0,
                       keepdims=True)   # (1, P) = L[j, :]
        ljj = jnp.sum(jnp.where(vec == j, Lrow, 0.0))
        acc = jnp.sum(jnp.where(vec < j, Lrow * y, 0.0))
        bj = jnp.sum(jnp.where(vec == j, b, 0.0))
        yj = (bj - acc) / ljj
        return jnp.where(vec == j, yj, y)

    y = jax.lax.fori_loop(0, P, fwd_step, jnp.zeros_like(b))

    # ---- back substitution: L^T x = y  (row j of L^T = column j of L) ----
    def back_step(t, x):
        j = P - 1 - t
        Lcol = jnp.sum(jnp.where(cols == j, L, 0.0), axis=1,
                       keepdims=True)[:, 0][None, :]   # (1, P) = L[:, j]^T
        ljj = jnp.sum(jnp.where(vec == j, Lcol, 0.0))
        acc = jnp.sum(jnp.where(vec > j, Lcol * x, 0.0))
        yj = jnp.sum(jnp.where(vec == j, y, 0.0))
        xj = (yj - acc) / ljj
        return jnp.where(vec == j, xj, x)

    x_ref[:] = jax.lax.fori_loop(0, P, back_step, jnp.zeros_like(b))


@partial(jax.jit, static_argnames=("interpret",))
def chol_solve(A, b, interpret: bool = False):
    """Solve SPD A x = b; A (P, P), b (P,).  One Pallas kernel."""
    P = A.shape[0]
    x = pl.pallas_call(
        partial(_chol_solve_kernel, P),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, P), A.dtype),
        interpret=interpret,
    )(A, b.reshape(1, P))
    return x.reshape(P)
