"""Multi-sequence data parallelism: vmapped front end sharded over a mesh.

The per-sequence front end is a pure ``(carry, frame) -> (carry, out)`` step
(``pipeline/frontend.py``), so scaling over sequences is literally
``shard_map(lax.scan(vmap(step)))`` over the ``data`` mesh axis — BASELINE
configs 4-5 ("all 8 Oxford eval sequences batched in parallel", "multi-host
partitioned").  SLAM is sequential in time, so per-sequence latency is fixed;
fleet throughput scales with the batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..pipeline import frontend as F
from .mesh import P, shard_map


def init_batched_carry(cfg: SlamConfig, batch: int):
    one = F.init_carry(cfg)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), one)


def make_batched_scan(cfg: SlamConfig, sensor_to_base, mesh=None):
    """Returns scan_fn(carries, frames) over a (B, T, ...) frame batch.

    With a mesh, the batch axis is sharded over ``data`` via shard_map; each
    device runs its own sequences' scans locally with zero communication.
    """

    def step(carry, frame):
        # descriptors off: fleet-throughput batches don't run the loop pass
        # per step, and stacking (B, T, ring, sector) wastes HBM
        return F.frontend_step(cfg, carry, frame, sensor_to_base,
                               with_descriptor=False)

    vstep = jax.vmap(step)

    def scan_local(carries, frames_bt):
        # frames_bt: (b, T, ...) -> time-major for the scan
        frames_tb = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), frames_bt)
        carries, outs = jax.lax.scan(
            lambda c, fr: vstep(c, fr), carries, frames_tb
        )
        outs = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), outs)
        return carries, outs

    if mesh is None:
        return jax.jit(scan_local)

    # Every leaf is batch-leading, so a single P('data') prefix-spec shards
    # the whole pytree.
    sharded = shard_map(
        scan_local, mesh=mesh, in_specs=P("data"), out_specs=P("data")
    )
    return jax.jit(sharded)
