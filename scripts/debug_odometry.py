import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from randt_slam_tpu.io import synthetic, formats
from randt_slam_tpu.pipeline import slam, frontend as F
from tests.test_odometry_e2e import small_cfg

cfg = small_cfg()
seq = synthetic.generate(seed=3, n_frames=24, n_azimuths=128, n_bins=256,
                         speed=4.0, dt=0.25)
frames = slam.frames_from_arrays(seq.intensity, seq.azimuths, seq.ranges, seq.stamps)

# inspect preprocessing + scan cells of frame 0/1
fr0 = jax.tree.map(lambda x: x[0], frames)
scan0, filt0 = F.build_scan_cells(cfg, fr0, jnp.zeros(3))
print("filtered points:", int(filt0.mask.sum()), "beams:", int(filt0.beam_mask.sum()))
print("valid scan cells:", int(scan0.valid.sum()))
mu = np.asarray(scan0.mean)[np.asarray(scan0.valid)]
print("cell mean range:", np.abs(mu[:, :2]).max(), "intensity", mu[:, 2].min(), mu[:, 2].max())

r = slam.run_odometry(cfg, frames, use_scan=False)
est = r.odom_poses
gt = seq.gt_poses
for t in range(0, 24):
    print(f"t={t:2d} est=({est[t,0]:7.2f},{est[t,1]:7.2f},{est[t,2]:6.3f}) "
          f"gt=({gt[t,0]:7.2f},{gt[t,1]:7.2f},{gt[t,2]:6.3f}) rej={r.rejected_frames[t]} ")
print("ATE:", formats.ate(est, gt))
