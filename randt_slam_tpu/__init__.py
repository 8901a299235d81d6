"""TPU-native radar NDT SLAM engine (JAX / XLA / Pallas / pjit).

A from-scratch re-architecture of the capabilities of RaNDT SLAM
(IGMR-RWTH/RaNDT-SLAM, IROS 2024) for TPU hardware: fixed-shape batched
tensors, vmapped per-cell/per-residual math, a batched Gauss-Newton /
Levenberg-Marquardt smoother with Barron-loss graduated non-convexity,
vectorized ScanContext loop closure, and batched pose-graph optimization.
"""

import os as _os

# Persistent XLA compilation cache: pipeline-step compiles run minutes on the
# TPU backend; caching them to disk makes every re-run (tests, bench, CLI)
# start in seconds.  Opt out with RANDT_NO_COMPILE_CACHE=1.
if not _os.environ.get("RANDT_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(__file__)),
                      ".jax_cache"),
    )
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

    import jax as _jax  # set programmatically too, in case jax was imported
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Float32 matmul precision by default.  TPU f32 matmuls lower to bf16 MXU
# passes unless told otherwise, and this workload's accuracy-critical
# contractions are small-matrix state-estimation math (SE(2) transforms of
# cell distributions, 3x3 covariance whitening, window Jacobians) where bf16
# rounding of ~0.4% is catastrophic: the synthetic e2e run diverges from
# 0.09 m ATE (f32) to 12.5 m (bf16) once cell intensity variance is realistic.
# The FLOP-heavy tolerant kernels opt in to faster passes explicitly (the
# Pallas segment-moments kernel pins its own precision).  Opt out with
# RANDT_MATMUL_PRECISION=default|high|highest.
import jax as _jax2

_jax2.config.update(
    "jax_default_matmul_precision",
    _os.environ.get("RANDT_MATMUL_PRECISION", "highest"),
)

from . import config, geometry  # noqa: F401

__version__ = "0.1.0"
