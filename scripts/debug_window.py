import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from randt_slam_tpu.io import synthetic
from randt_slam_tpu.pipeline import slam, frontend as F
from randt_slam_tpu.registration import matcher, residuals as R
from randt_slam_tpu.ndt import grid as G, cells as C
from tests.test_odometry_e2e import small_cfg

cfg = small_cfg()
seq = synthetic.generate(seed=3, n_frames=4, n_azimuths=128, n_bins=256, speed=4.0, dt=0.25)
frames = slam.frames_from_arrays(seq.intensity, seq.azimuths, seq.ranges, seq.stamps)

geom = G.GridGeom.from_config(cfg.ndt_map)
fr0 = jax.tree.map(lambda x: x[0], frames)
fr1 = jax.tree.map(lambda x: x[1], frames)
scan0, _ = F.build_scan_cells(cfg, fr0, jnp.zeros(3))
scan1, _ = F.build_scan_cells(cfg, fr1, jnp.zeros(3))
print("scan0 valid:", int(scan0.valid.sum()), "scan1 valid:", int(scan1.valid.sum()))

submap = G.scatter_cells(geom, G.empty_grid(geom), scan0.stats, scan0.valid)
f1 = G.derive_grid_fields(submap, cfg.ndt_map.min_points_per_cell, cfg.ndt_map.cell)
print("grid valid cells:", int(f1[2].sum()))

W = cfg.matcher.smoothing_steps
Cc = cfg.capacity.max_scan_cells
fixed = matcher.FixedMaps(
    mean=jnp.stack([f1[0], jnp.zeros_like(f1[0])]),
    cov=jnp.stack([f1[1], jnp.zeros_like(f1[1])]),
    valid=jnp.stack([f1[2], jnp.zeros_like(f1[2])]),
    use=jnp.asarray([True, False]),
)

# window: anchor = state0 (identity), one active state (predicted identity)
states = jnp.zeros((W + 1, 9))
stamps = jnp.asarray([0.0, 0.0, 0.0, 0.25])
state_exists = jnp.asarray([False, False, True, True])
imu = jnp.zeros(W)
scan_mean = jnp.zeros((W, Cc, 3)).at[W-1].set(scan1.mean)
scan_cov = jnp.broadcast_to(jnp.eye(3), (W, Cc, 3, 3)).at[W-1].set(scan1.cov)
scan_valid = jnp.zeros((W, Cc), bool).at[W-1].set(scan1.valid)
scans = matcher.ScanWindow(mean=scan_mean, cov=scan_cov, valid=scan_valid)

est = matcher.estimate_window(cfg, states, stamps, state_exists, imu, scans, fixed,
                              jnp.zeros(3))
print("estimated newest state:", np.asarray(est.states[-1])[:6])
print("gt pose 1:", seq.gt_poses[1])
print("rejected:", bool(est.rejected), "cost:", float(est.cost), "n_res:", int(est.n_residuals))

# residual probe at zero params
from randt_slam_tpu.registration import solver, barron
import jax
# rebuild residual internals quickly: check association count at pose 0
q_mu, q_cov = matcher.transform_mean_cov(jnp.zeros(3), scan1.mean, scan1.cov)
nb = G.window_neighbors(geom, f1[0], f1[1], f1[2], q_mu, q_cov, scan1.valid,
                        cfg.matcher.n_results_nn_lookup, cfg.ndt_map.nn_window_radius)
print("assoc valid pairs:", int(nb.valid.sum()))
r = R.ndt_residual(jnp.zeros(3), scan1.mean[:, None, :].repeat(2,1), scan1.cov[:, None].repeat(2,1), nb.mean, nb.cov)
rv = np.asarray(r)[np.asarray(nb.valid)]
print("residuals at identity: mean", rv.mean(), "max", rv.max())
