"""TPU-native radar NDT SLAM engine (JAX / XLA / Pallas / pjit).

A from-scratch re-architecture of the capabilities of RaNDT SLAM
(IGMR-RWTH/RaNDT-SLAM, IROS 2024) for TPU hardware: fixed-shape batched
tensors, vmapped per-cell/per-residual math, a batched Gauss-Newton /
Levenberg-Marquardt smoother with Barron-loss graduated non-convexity,
vectorized ScanContext loop closure, and batched pose-graph optimization.
"""

from . import config, geometry  # noqa: F401

__version__ = "0.1.0"
