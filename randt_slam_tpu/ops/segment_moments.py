"""Segment-sum of per-point channel vectors as a tiled one-hot matmul.

The scan-NDT build accumulates per-cluster sufficient statistics
(n, Σp, Σppᵀ) over ~26k points into ~3k cluster slots (reference:
``Cell::updateCell`` point loops, ``RS/src/ndt_representation/
ndt_cell.cpp:43-65``, driven per cluster from ``Map::insertCluster``).
``jax.ops.segment_sum`` lowers to scatter-add, which serializes on TPU and
was ~18% of front-end device time.  This kernel reformulates the reduction
for the MXU:

    out[s, c] = Σ_p [ids[p] == s] · values[p, c]

tiled over (segment tiles × point tiles); the one-hot tile is built on the
fly in VMEM (never materialized in HBM) and contracted with the point-tile
values on the MXU, accumulating output tiles across the point-tile grid
axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(ids_ref, val_ref, out_ref, *, seg_tile: int):
    j = pl.program_id(1)
    ids = ids_ref[:]  # (PT, 1) int32
    seg_base = pl.program_id(0) * seg_tile
    seg_ids = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], seg_tile), 1)
    onehot = (ids == seg_ids + seg_base).astype(jnp.float32)  # (PT, ST)
    acc = jax.lax.dot_general(
        onehot, val_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # f32 moments: no bf16 pass
    )  # (ST, CH)

    @pl.when(j == 0)
    def _():
        out_ref[:] = acc

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


@functools.partial(jax.jit, static_argnames=("num_segments", "point_tile",
                                             "seg_tile"))
def _segment_moments_pallas(values, ids, num_segments: int,
                            point_tile: int = 1024, seg_tile: int = 512):
    P, CH = values.shape
    CHp = _round_up(CH, 128)
    Pp = _round_up(P, point_tile)
    Sp = _round_up(num_segments, seg_tile)

    vals = jnp.zeros((Pp, CHp), values.dtype).at[:P, :CH].set(values)
    # Padded points get id == Sp (matches no segment tile).
    ids_p = jnp.full((Pp, 1), Sp, jnp.int32).at[:P, 0].set(ids.astype(jnp.int32))

    grid = (Sp // seg_tile, Pp // point_tile)
    out = pl.pallas_call(
        functools.partial(_kernel, seg_tile=seg_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((point_tile, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((point_tile, CHp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((seg_tile, CHp), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Sp, CHp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Pp * Sp * CHp, bytes_accessed=Pp * CHp * 4 + Sp * CHp * 4,
            transcendentals=0,
        ),
    )(ids_p, vals)
    return out[:num_segments, :CH]


def segment_moments(values, ids, num_segments: int):
    """Masked segment sum: out[s] = Σ_p [ids[p] == s] values[p].

    values: (P, CH) float32; ids: (P,) int32, entries outside [0, num_segments)
    are dropped.  Uses the Pallas MXU kernel on TPU for problem sizes where
    scatter-add hurts; falls back to ``jax.ops.segment_sum`` elsewhere (CPU
    test meshes, tiny problems).
    """
    P, CH = values.shape
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and P >= 2048 and 256 <= num_segments <= 2048:
        return _segment_moments_pallas(values, ids, num_segments)
    safe = jnp.where((ids >= 0) & (ids < num_segments), ids, num_segments)
    return jax.ops.segment_sum(values, safe, num_segments=num_segments + 1)[
        :num_segments
    ]


def segment_topk_moments(values, ids, num_segments: int, k: int):
    """Fused segment-sum + top-k compaction: reduce ``values`` into the ``k``
    segments with the largest channel-0 sums, returning ``(out (k, CH),
    seg_ids (k,))`` ordered by descending channel-0 sum.

    Channel 0 must be the per-point weight (point count): the scan-NDT build
    keeps only the ``max_scan_cells`` most-populated cells, so the expensive
    multi-channel reduction only needs to cover those k segments.  Pass 1 is a
    cheap scalar scatter-add of the weights over all segments; pass 2 remaps
    point ids through the top-k rank table and runs the one-hot MXU matmul
    with a k-wide (not num_segments-wide) one-hot — on the Oxford config this
    is ~7x less matmul work than a full-width single pass.
    """
    P, CH = values.shape
    ok = (ids >= 0) & (ids < num_segments)
    safe = jnp.where(ok, ids, num_segments)
    counts = jax.ops.segment_sum(
        values[:, 0], safe, num_segments=num_segments + 1
    )[:num_segments]
    _, topi = jax.lax.top_k(counts, k)

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and P >= 2048 and k >= 128:
        rank = jnp.full((num_segments + 1,), k, jnp.int32).at[topi].set(
            jnp.arange(k, dtype=jnp.int32), mode="drop"
        )
        rid = rank[safe]
        out = _segment_moments_pallas(values, rid, k)
        return out, topi
    full = jax.ops.segment_sum(values, safe, num_segments=num_segments + 1)[
        :num_segments
    ]
    return full[topi], topi
