"""Capture an on-device profile of the bench scan and print the op breakdown."""
import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from bench import build_config
from randt_slam_tpu.io import synthetic
from randt_slam_tpu.pipeline import frontend as F
from randt_slam_tpu.pipeline import slam

TRACE_DIR = "/tmp/randt_trace"


def main():
    cfg = build_config()
    T = 40
    seq = synthetic.generate(seed=0, n_frames=T, n_azimuths=400, n_bins=512,
                             max_range=100.0, speed=4.0, dt=0.25, n_walls=120)
    frames = slam.frames_from_arrays(seq.intensity, seq.azimuths, seq.ranges,
                                     seq.stamps)
    s2b = jnp.zeros(3)

    def scan_body(c, frm):
        return F.frontend_step(cfg, c, frm, s2b)

    scan_fn = jax.jit(lambda c, fs: jax.lax.scan(scan_body, c, fs))
    carry0 = F.init_carry(cfg)
    carry, outs = scan_fn(carry0, frames)
    jax.block_until_ready(outs.odom_pose)

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        carry, outs = scan_fn(carry0, frames)
        jax.block_until_ready(outs.odom_pose)

    # find the xplane file
    files = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    print("xplane files:", files)

    from xprof.convert import raw_to_tool_data as rtd
    params = {"tqx": "out:json;"}
    data, _ = rtd.xspace_to_tool_data(files, "op_profile", params)
    with open("/tmp/op_profile.json", "w") as f:
        if isinstance(data, bytes):
            data = data.decode()
        f.write(data)
    prof = json.loads(data)

    def walk(node, depth=0, out=None):
        m = node.get("metrics", {})
        name = node.get("name", "?")
        t = m.get("rawTime", 0)
        out.append((t, name, depth))
        for ch in node.get("children", []):
            walk(ch, depth + 1, out)
        return out

    root = prof.get("byProgram", prof.get("byCategory", None))
    if root:
        rows = walk(root, 0, [])
        total = rows[0][0] or 1
        rows = sorted([r for r in rows if r[2] in (2, 3)], reverse=True)[:40]
        for t, name, d in rows:
            print(f"{t/1e9*1e3:9.3f} ms  {100*t/total:5.1f}%  d{d}  {name[:90]}")


if __name__ == "__main__":
    main()
