"""Hardware golden gate: the compiled (Mosaic) Pallas kernels vs the torch
oracle, asserted on the real chip (VERDICT r3 #6; reference protocol
evaluate.py:1523-1557).

Auto-skips when no TPU backend is reachable.  Runs tools/verify_tpu.py in a
subprocess because this pytest session pins jax to the 8-device virtual CPU
backend (tests/conftest.py) and a backend cannot be re-selected in-process.
The oracle snapshot is cached at tests/data/oracle_craft_128.npz so the
hardware run itself needs no torch.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NPZ = os.path.join(REPO, "tests", "data", "oracle_craft_128.npz")


def _clean_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return env


def _tpu_reachable() -> bool:
    probe = ("import jax, sys; "
             "sys.exit(0 if jax.default_backend() not in ('cpu',) else 1)")
    try:
        return subprocess.run(
            [sys.executable, "-c", probe], env=_clean_env(),
            capture_output=True, timeout=120).returncode == 0
    except subprocess.TimeoutExpired:
        return False


@pytest.mark.tpu
@pytest.mark.slow
def test_compiled_kernels_match_oracle_on_tpu():
    if not _tpu_reachable():
        pytest.skip("no TPU backend reachable")
    os.makedirs(os.path.dirname(NPZ), exist_ok=True)
    if not os.path.exists(NPZ):
        # Build the oracle snapshot on CPU first (needs torch + reference);
        # the subsequent hardware run only loads it.  On a TPU host without
        # torch or /root/reference, 'oracle unavailable' must read as a
        # skip, not a kernel regression.
        try:
            import torch  # noqa: F401
        except ImportError:
            pytest.skip("oracle npz absent and torch unavailable to build it")
        if not os.path.isdir("/root/reference"):
            pytest.skip("oracle npz absent and /root/reference not present")
        build = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "verify_tpu.py"),
             "--npz", NPZ, "--assert"], env=_clean_env(),
            capture_output=True, text=True, timeout=1800)
        assert build.returncode == 0, build.stdout + build.stderr
        assert os.path.exists(NPZ)
        return  # that run already asserted the bounds on the TPU backend
    run = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "verify_tpu.py"),
         "--npz", NPZ, "--assert"], env=_clean_env(),
        capture_output=True, text=True, timeout=1800)
    assert run.returncode == 0, run.stdout + run.stderr
