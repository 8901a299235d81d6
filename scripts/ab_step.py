"""Quick A/B harness: steady-state device time of one ``frontend_step``.

Same methodology as scripts/mfu.py (pipelined independent calls on
device-resident args -> wall/N ~= device time).  Usage:

    python scripts/ab_step.py [lm_max_iterations] [gnc_steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from bench import build_config, build_frames
from randt_slam_tpu.pipeline import frontend as F


def main():
    cfg = build_config()
    if len(sys.argv) > 1:
        cfg = cfg.replace(matcher=dataclasses.replace(
            cfg.matcher, lm_max_iterations=int(sys.argv[1])))
    if len(sys.argv) > 2:
        cfg = cfg.replace(matcher=dataclasses.replace(
            cfg.matcher, gnc_steps=int(sys.argv[2])))
    frames, _ = build_frames(n_frames=20)
    s2b = jnp.zeros(3)
    step = jax.jit(lambda c, fr: F.frontend_step(cfg, c, fr, s2b))
    carry = F.init_carry(cfg)
    for i in range(12):
        fr = jax.tree.map(lambda a: jnp.asarray(a[i]), frames)
        carry, _ = step(carry, fr)
    jax.block_until_ready(carry.states)
    frN = jax.tree.map(lambda a: jnp.asarray(a[12]), frames)
    out = step(carry, frN)
    jax.block_until_ready(out[0].states)
    for n in (30, 30):
        t0 = time.perf_counter()
        for _ in range(n):
            out = step(carry, frN)
        jax.block_until_ready(out[0].states)
        dt = (time.perf_counter() - t0) / n
    # report final pose so semantic drift between variants is visible
    c2, o = step(carry, frN)
    print(f"device_ms_per_step={dt*1e3:.3f} pose={np.asarray(o.odom_pose)} "
          f"nres={int(o.n_residuals)}")


if __name__ == "__main__":
    main()
