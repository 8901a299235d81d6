"""A/B the Pallas-fused LM path vs the jacfwd path on the real backend:
same synthetic sequence, compare odometry poses and per-frame step time."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(use_pallas, frames, cfg0, use_chol=None):
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from randt_slam_tpu.pipeline import frontend as F

    if use_chol is None:
        use_chol = use_pallas
    cfg = cfg0.replace(matcher=dc.replace(
        cfg0.matcher, use_pallas_linearize=use_pallas,
        use_pallas_chol=use_chol))
    s2b = jnp.zeros(3)

    def body(c, fr):
        c2, out = F.frontend_step(cfg, c, fr, s2b)
        return c2, (out.odom_pose, out.sc_desc)

    scan_fn = jax.jit(lambda c, fs: jax.lax.scan(body, c, fs))
    T = 40
    d = jax.tree.map(lambda a: jnp.asarray(a[:T]), frames)
    c0 = F.init_carry(cfg)
    t0 = time.perf_counter()
    _, (poses, _) = scan_fn(c0, d)
    jax.block_until_ready(poses)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        _, (poses, _) = scan_fn(c0, d)
    jax.block_until_ready(poses)
    ms = (time.perf_counter() - t0) / reps / T * 1e3
    return np.asarray(poses), ms, compile_s


def main():
    from bench import build_config, build_frames

    cfg = build_config()
    frames, gt = build_frames()
    combos = [("jacfwd+lu   ", False, False), ("jacfwd+chol ", False, True),
              ("pallas+lu   ", True, False), ("pallas+chol ", True, True)]
    results = {}
    for name, lin, chol in combos:
        p, ms, c = run(lin, frames, cfg, use_chol=chol)
        results[name] = p
        print(f"{name}: {ms:.3f} ms/frame (compile {c:.0f}s)", flush=True)
    p_ref = results["jacfwd+lu   "]
    gt40 = gt[:40]
    for name, _, _ in combos:
        p = results[name]
        d = np.abs(p - p_ref)
        ate = np.sqrt(((p[:, :2] - gt40[:, :2]) ** 2).sum(1).mean())
        print(f"{name}: ATE {ate:.4f} m; delta vs ref xy {d[:, :2].max():.1e}"
              f" th {d[:, 2].max():.1e}")


if __name__ == "__main__":
    main()
