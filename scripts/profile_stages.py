"""Fine-grained stage timing: filter vs segment_sum vs compact vs gather."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_config
from randt_slam_tpu.io import synthetic
from randt_slam_tpu.pipeline import frontend as F
from randt_slam_tpu.pipeline import slam
from randt_slam_tpu.ndt import cells as C
from randt_slam_tpu.ndt import grid as G
from randt_slam_tpu import preprocess as pp
from randt_slam_tpu.registration import matcher


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:42s} {dt*1e3:8.3f} ms")
    return out


def main():
    cfg = build_config()
    T = 12
    seq = synthetic.generate(seed=0, n_frames=T, n_azimuths=400, n_bins=512,
                             max_range=100.0, speed=4.0, dt=0.25, n_walls=120)
    frames = slam.frames_from_arrays(seq.intensity, seq.azimuths, seq.ranges,
                                     seq.stamps)
    s2b = jnp.zeros(3)
    step = jax.jit(lambda c, fr: F.frontend_step(cfg, c, fr, s2b))
    carry = F.init_carry(cfg)
    for i in range(T):
        fr = jax.tree.map(lambda a: a[i], frames)
        carry, _ = step(carry, fr)
    jax.block_until_ready(carry.submap.stats.n)
    fr = jax.tree.map(lambda a: a[T - 1], frames)

    scan_t = pp.PolarScan(intensity=fr.intensity, azimuths=fr.azimuths,
                          ranges=fr.ranges, azimuth_mask=fr.azimuth_mask)

    filt = timeit("filter_scan", jax.jit(
        lambda s: pp.filter_scan(s, cfg.preprocessor, s2b)), scan_t)
    ids, num = pp.cluster_ids(filt.points, filt.mask, cfg.preprocessor)
    print(f"  P={filt.points.shape[0]} segments={num}")

    cell_cfg = cfg.ndt_map.cell
    use_pndt = cell_cfg.use_pndt
    fp = jax.jit(lambda p, m, i: C.from_points(
        p, m, i, num,
        polar=filt.polar if use_pndt else None,
        beam_cov=np.asarray(cell_cfg.beam_cov) if use_pndt else None))
    dense = timeit("from_points (segment_sum)", fp, filt.points, filt.mask, ids)

    cm = jax.jit(lambda d: C.compact(d, cfg.capacity.max_scan_cells))
    stats = timeit("compact (top_k)", cm, dense)[0]

    mc = jax.jit(lambda s: C.mean_cov(s, cell_cfg.eig_floor_ratio,
                                      cell_cfg.intensity_var_jitter,
                                      use_pndt=use_pndt))
    timeit("mean_cov (512 cells)", mc, stats)

    # association parts
    geom = G.GridGeom.from_config(cfg.ndt_map)
    dgf = jax.jit(lambda g: G.derive_sparse_fields(g, cfg.ndt_map.min_points_per_cell, cell_cfg))
    f1 = dgf(carry.submap)
    jax.block_until_ready(f1)
    W = cfg.matcher.smoothing_steps
    K = cfg.matcher.n_results_nn_lookup
    radius = cfg.ndt_map.nn_window_radius
    print(f"  K={K} radius={radius} window={2*radius+1}^2")
    poses = carry.states[-W:, :3]
    q_mu, q_cov = matcher.transform_mean_cov(poses, carry.scan_mean, carry.scan_cov)

    # raw index-grid gather only (the sparse path's HBM-bound part)
    def gather_index(idx, qm):
        ix, iy, inb = G.cell_index(geom, qm[..., :2])
        d = jnp.arange(-radius, radius + 1)
        dyy, dxx = jnp.meshgrid(d, d, indexing="ij")
        nx = ix[:, None] + dxx.reshape(-1)[None, :]
        ny = iy[:, None] + dyy.reshape(-1)[None, :]
        flat = jnp.clip(ny * geom.size_x + nx, 0, geom.size_x * geom.size_y - 1)
        return idx.reshape(-1)[flat]
    go = jax.jit(jax.vmap(gather_index, in_axes=(None, 0)))
    timeit("index-grid window gather (W slots)", go, carry.submap.index, q_mu)

    wn = jax.jit(jax.vmap(
        lambda qm, qc, qv: G.window_neighbors_sparse(
            geom, carry.submap.index, f1[0], f1[1], f1[2], qm, qc, qv,
            K, radius,
            use_distribution_metric=cfg.matcher.lookup_distribution)))
    timeit("window_neighbors_sparse (W slots, 1 map)", wn,
           q_mu, q_cov, carry.scan_valid)


if __name__ == "__main__":
    main()
