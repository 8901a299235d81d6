"""Test environment: force the CPU backend with 8 virtual devices so that
sharding/multi-chip tests run without TPU hardware (SURVEY.md §4).

Note: the axon TPU PJRT plugin in this image ignores the ``JAX_PLATFORMS``
environment variable, so the platform is pinned programmatically before any
backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
