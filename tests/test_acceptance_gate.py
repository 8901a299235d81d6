"""Accuracy regression gate as a pytest target (VERDICT r3 item 6).

``pytest -m acceptance`` re-runs the 10-12-32 revisit window on the real TPU
chip through ``scripts/acceptance_gate.py`` and FAILS if drift / ATE / loop
behavior leaves the calibrated bands.  Opt-in (excluded by the default
``-m 'not acceptance'`` addopts) because it needs the real chip and ~5-10
minutes; the gate script itself carries a ``--selftest`` proving it can go
red.

The run happens in a subprocess with a clean environment because this suite's
conftest pins the CPU backend with 8 virtual devices.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.acceptance

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_acceptance_gate_green_on_tpu():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # undo the virtual-CPU pin
    env.pop("JAX_PLATFORM_NAME", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "acceptance_gate.py")],
        env=env, capture_output=True, text=True, timeout=2400, cwd=REPO,
    )
    assert r.returncode == 0, (
        f"acceptance gate RED:\n{r.stdout[-3000:]}\n{r.stderr[-2000:]}"
    )


def test_acceptance_gate_can_go_red():
    """The gate's self-test (CS threshold -> 0 kills every loop) must fail."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORM_NAME", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "acceptance_gate.py"),
         "--selftest"],
        env=env, capture_output=True, text=True, timeout=2400, cwd=REPO,
    )
    assert r.returncode == 0, (
        f"gate self-test broken:\n{r.stdout[-3000:]}\n{r.stderr[-2000:]}"
    )
