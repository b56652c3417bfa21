"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (the TPU-native analog of testing
multi-node without a cluster)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
