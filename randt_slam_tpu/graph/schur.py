"""Distributed pose-graph solve: edge-sharded normal-equation assembly.

The reference solves its pose graph with single-process sparse Cholesky
(``global_fuser.cpp:52-59``).  For pod-scale batches the TPU build shards the
EDGE set over the mesh: each device assembles the Hessian/gradient
contribution of its edge shard (closed-form 3x3 blocks, ``pose_graph.py``),
an all-reduce (psum over ICI) combines them, and the damped dense solve runs
replicated — the "reduce-scatter of per-edge Hessian blocks" pattern from
SURVEY.md §5.  A Schur-complement reduction over submap-root separator
variables (for graphs too large for a dense solve) is the planned extension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import GlobalFuserConfig
from ..geometry import normalize_angle
from ..parallel.mesh import P, shard_map
from . import pose_graph as PG


def _pad_edges(g: PG.PoseGraph, multiple: int) -> PG.PoseGraph:
    E = g.id_begin.shape[0]
    pad = (-E) % multiple
    if pad == 0:
        return g
    z3 = jnp.zeros((pad, 3), g.trans.dtype)
    return PG.PoseGraph(
        poses=g.poses,
        id_begin=jnp.concatenate([g.id_begin, jnp.zeros(pad, jnp.int32)]),
        id_end=jnp.concatenate([g.id_end, jnp.zeros(pad, jnp.int32)]),
        trans=jnp.concatenate([g.trans, z3]),
        sqrt_information=jnp.concatenate(
            [g.sqrt_information, jnp.zeros((pad, 3, 3), g.trans.dtype)]
        ),
        valid=jnp.concatenate([g.valid, jnp.zeros(pad, bool)]),
    )


def optimize_distributed(g: PG.PoseGraph, cfg: GlobalFuserConfig, mesh):
    """Gauss-Newton with the per-iteration assembly sharded over ``data``."""
    n_dev = mesh.devices.size
    g = _pad_edges(g, n_dev)
    N = g.poses.shape[0]
    dtype = g.poses.dtype
    fixed_mask = jnp.zeros(N, bool).at[0].set(True)
    free_f = (~jnp.repeat(fixed_mask, 3)).astype(dtype)

    edge_leaves = (g.id_begin, g.id_end, g.trans, g.sqrt_information, g.valid)

    def local_assemble(poses, id_begin, id_end, trans, sqrtI, valid):
        sub = PG.PoseGraph(
            poses=poses, id_begin=id_begin, id_end=id_end, trans=trans,
            sqrt_information=sqrtI, valid=valid,
        )
        H, grad, cost = PG._assemble(
            poses, sub, cfg.use_robust_loss, cfg.loss_function_scale
        )
        H = jax.lax.psum(H, "data")
        grad = jax.lax.psum(grad, "data")
        cost = jax.lax.psum(cost, "data")
        return H, grad, cost

    assemble = shard_map(
        local_assemble,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P("data"), P("data")),
        out_specs=(P(), P(), P()),
    )

    def body(carry):
        poses, lam, cost_prev, it, done = carry
        H, grad, cost = assemble(poses, *edge_leaves)
        H = H * free_f[:, None] * free_f[None, :]
        grad = grad * free_f
        damp = lam * jnp.maximum(jnp.diag(H), 1e-8) + (1.0 - free_f)
        delta = -jnp.linalg.solve(H + jnp.diag(damp), grad) * free_f
        trial = poses + delta.reshape(N, 3)
        trial = trial.at[:, 2].set(normalize_angle(trial[:, 2]))
        _, _, cost_new = assemble(trial, *edge_leaves)
        accept = cost_new < cost
        poses_n = jnp.where(accept, trial, poses)
        lam_n = jnp.clip(jnp.where(accept, lam / 3.0, lam * 4.0), 1e-12, 1e8)
        small = jnp.linalg.norm(delta) < cfg.tolerance * (1.0 + jnp.linalg.norm(poses))
        done_n = (accept & small) | ((~accept) & (lam >= 1e7))
        return poses_n, lam_n, jnp.where(accept, cost_new, cost), it + 1, done_n

    def cond(carry):
        _, _, _, it, done = carry
        return (it < cfg.max_iterations) & (~done)

    init = (g.poses, jnp.asarray(1e-6, dtype), jnp.asarray(jnp.inf, dtype),
            jnp.int32(0), jnp.bool_(False))
    poses, _, cost, iters, _ = jax.lax.while_loop(cond, body, init)
    return poses, {"cost": cost, "iterations": iters}
