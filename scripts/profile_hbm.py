"""Per-op HBM-traffic profile of one ``frontend_step`` (VERDICT r3 item 1).

Compiles a single donated-carry ``frontend_step``, captures an on-device
trace of many back-to-back invocations, and joins the op-level profile with
the optimized HLO so every expensive op is named with its shapes.  Output:
a table of (device time, %, op, HLO shapes/kind) — the evidence for where
the ~GB/frame of HBM traffic goes.

Run on the real chip:  python scripts/profile_hbm.py
"""
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_config, build_frames
from randt_slam_tpu.pipeline import frontend as F

TRACE_DIR = "/tmp/randt_hbm_trace"


def main():
    cfg = build_config()
    frames, _gt = build_frames(n_frames=40)
    frames = jax.tree.map(np.asarray, frames)  # host-side frame slicing
    s2b = jnp.zeros(3)

    step = jax.jit(
        lambda c, frm: F.frontend_step(cfg, c, frm, s2b),
        donate_argnums=(0,),
    )
    carry0 = F.init_carry(cfg)
    frame0 = jax.tree.map(lambda a: a[20], frames)
    # The axon backend rejects donation of host-built buffers: run the first
    # step through a non-donating jit so the carry is device-native.
    step0 = jax.jit(lambda c, frm: F.frontend_step(cfg, c, frm, s2b))
    c, _ = step0(carry0, jax.tree.map(lambda a: a[0], frames))
    # warm the carry with a few frames so the submap is non-trivial
    for i in range(1, 12):
        fi = jax.tree.map(lambda a: a[i], frames)
        c, _ = step(c, fi)
    jax.block_until_ready(c.submap.count)

    lowered = jax.jit(
        lambda c, frm: F.frontend_step(cfg, c, frm, s2b), donate_argnums=(0,)
    ).lower(c, frame0)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(json.dumps({
        "cost_bytes_accessed_mb": round(float(ca.get("bytes accessed", 0)) / 1e6, 1),
        "cost_flops_g": round(float(ca.get("flops", 0)) / 1e9, 3),
    }))
    hlo = compiled.as_text()
    with open("/tmp/frontend_step_hlo.txt", "w") as f:
        f.write(hlo)

    # op name -> defining HLO line (shapes etc.)
    hlo_lines = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT\s+)?%?([\w\.\-]+)\s*=\s*(.*)", line)
        if m:
            hlo_lines[m.group(1)] = m.group(2)[:220]

    os.system(f"rm -rf {TRACE_DIR}")
    N = 100
    with jax.profiler.trace(TRACE_DIR):
        for i in range(N):
            fi = jax.tree.map(lambda a: a[12 + (i % 20)], frames)
            c, out = step(c, fi)
        jax.block_until_ready(c.submap.count)

    files = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data(files, "op_profile", {"tqx": "out:json;"})
    if isinstance(data, bytes):
        data = data.decode()
    prof = json.loads(data)

    rows = []

    def walk(node, depth=0):
        m = node.get("metrics", {})
        rows.append((m.get("rawTime", 0), node.get("name", "?"), depth))
        for ch in node.get("children", []):
            walk(ch, depth + 1)

    root = prof.get("byProgram", prof.get("byCategory"))
    walk(root)
    total = rows[0][0] or 1
    leaf = sorted([r for r in rows if r[2] == 3], reverse=True)[:45]
    print(f"{'ms/frame':>9} {'%':>6}  op  |  HLO")
    for t, name, d in leaf:
        base = name.split(" and its")[0].strip()
        h = hlo_lines.get(base, "")
        # strip metadata/backend_config noise
        h = re.sub(r", metadata=\{[^}]*\}", "", h)
        h = re.sub(r", backend_config=\{.*$", "", h)
        ms_per_frame = t / 1e9 * 1e3 / N  # rawTime ps -> ms, per frame
        print(f"{ms_per_frame:9.4f} {100*t/total:5.1f}%  {base[:46]:46s}| {h[:150]}")


if __name__ == "__main__":
    main()
