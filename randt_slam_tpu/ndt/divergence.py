"""Cauchy-Schwarz divergence between two NDT mixtures, batched.

Replaces ``Map::calculateCSDivergence`` (``RS/src/ndt_representation/
ndt_map.cpp:42-99``): the reference's O(F*M + F^2 + M^2) nested loops become
masked all-pairs Gaussian-overlap reductions.  The self-similarity terms of
each map are invariant under rigid transforms, so they are exposed separately
(:func:`self_term`) and can be cached per submap / per scan; only the
interaction term (:func:`interaction_term`) depends on the candidate loop
transform.

The reference's exact constants are reproduced, including its
``0.5/sqrt(pi^2 det(S))`` overlap normalization (``ndt_map.cpp:64``) and the
``det(cov) < 1e-5`` degenerate-cell gate (``ndt_map.cpp:55,68,83``).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import cells as C

_DET_GATE = 1e-5


def _safe_cells(mean, cov, valid):
    """Replace invalid (padded) cells with benign values so masked terms never
    produce inf/NaN through exp/log (inf * 0 == NaN)."""
    eye = jnp.broadcast_to(jnp.eye(3, dtype=cov.dtype), cov.shape)
    v = valid[..., None]
    return jnp.where(v, mean, 0.0), jnp.where(v[..., None], cov, eye)


def _overlap(mu_a, cov_a, mu_b, cov_b):
    """Pairwise Gaussian overlap g = 0.5/sqrt(pi^2 det(S)) exp(-0.5 d^T S^-1 d).

    The Mahalanobis exponent is clamped to >= 0 (it is for PSD covariances;
    degenerate float32 cells can go indefinite) and bounded to avoid overflow.
    """
    d = mu_a - mu_b
    S = cov_a + cov_b
    sol = C.solve3(S, d)
    expo = jnp.clip(jnp.einsum("...i,...i->...", d, sol), 0.0, 120.0)
    det = jnp.maximum(C.det3(S), 1e-30)
    return 0.5 / jnp.sqrt(jnp.pi * jnp.pi * det) * jnp.exp(-0.5 * expo)


def interaction_term(f_mean, f_cov, f_valid, m_mean, m_cov, m_valid):
    """Sum of overlaps between every (gated) fixed and moving cell.

    Only fixed cells pass the determinant gate (the reference gates the outer
    loop only, ``ndt_map.cpp:55``).
    """
    f_ok = f_valid & (C.det3(f_cov) >= _DET_GATE)
    f_mean, f_cov = _safe_cells(f_mean, f_cov, f_ok)
    m_mean, m_cov = _safe_cells(m_mean, m_cov, m_valid)
    g = _overlap(
        f_mean[:, None, :], f_cov[:, None], m_mean[None, :, :], m_cov[None, :]
    )
    w = (f_ok[:, None] & m_valid[None, :]).astype(g.dtype)
    return jnp.sum(g * w)


def self_term(mean, cov, valid, row_chunk: int = 1024):
    """Per-map self-similarity: sum_i sqrt(det(cov_i^-1))/(2 pi)
    + 2 * sum_{j<i} overlap(i, j), over determinant-gated cells
    (``ndt_map.cpp:71-79``).  Rigid-transform invariant.

    The O(n^2) pair sum is evaluated in row chunks (``lax.map``) so the
    (n, n, 3, 3) pooled-covariance intermediate never materializes — at
    Oxford submap capacity (4096 cells) the full tensor would be 38 GB
    per batched candidate.
    """
    import jax

    ok = valid & (C.det3(cov) >= _DET_GATE)
    det = jnp.maximum(C.det3(cov), 1e-30)
    diag = jnp.sum(jnp.where(ok, jnp.sqrt(1.0 / det) / (2.0 * jnp.pi), 0.0))
    mean, cov = _safe_cells(mean, cov, ok)
    n = mean.shape[0]
    if n <= row_chunk:
        g = _overlap(mean[:, None, :], cov[:, None],
                     mean[None, :, :], cov[None, :])
        lower = jnp.tril(jnp.ones((n, n), bool), k=-1)
        w = (ok[:, None] & ok[None, :] & lower).astype(g.dtype)
        return diag + 2.0 * jnp.sum(g * w)

    pad = (-n) % row_chunk
    mean_p = jnp.concatenate([mean, jnp.zeros((pad, 3), mean.dtype)])
    cov_p = jnp.concatenate(
        [cov, jnp.broadcast_to(jnp.eye(3, dtype=cov.dtype), (pad, 3, 3))])
    ok_p = jnp.concatenate([ok, jnp.zeros(pad, bool)])
    rows = jnp.arange(n + pad)

    def chunk_sum(lo):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, lo, row_chunk)
        m_r, c_r, ok_r, id_r = sl(mean_p), sl(cov_p), sl(ok_p), sl(rows)
        g = _overlap(m_r[:, None, :], c_r[:, None],
                     mean_p[None, :, :], cov_p[None, :])
        lower = id_r[:, None] > rows[None, :]
        w = (ok_r[:, None] & ok_p[None, :] & lower).astype(g.dtype)
        return jnp.sum(g * w)

    los = jnp.arange(0, n + pad, row_chunk)
    return diag + 2.0 * jnp.sum(jax.lax.map(chunk_sum, los))


def cs_divergence(
    f_mean, f_cov, f_valid, m_mean, m_cov, m_valid,
    f_self=None, m_self=None,
):
    """Full CS divergence; pass precomputed self terms to skip the O(N^2)
    self-similarity work (they are pose-invariant)."""
    inter = interaction_term(f_mean, f_cov, f_valid, m_mean, m_cov, m_valid)
    if f_self is None:
        f_self = self_term(f_mean, f_cov, f_valid)
    if m_self is None:
        m_self = self_term(m_mean, m_cov, m_valid)
    eps = 1e-30
    return (
        -jnp.log(jnp.maximum(inter, eps))
        + 0.5 * jnp.log(jnp.maximum(f_self, eps))
        + 0.5 * jnp.log(jnp.maximum(m_self, eps))
    )
