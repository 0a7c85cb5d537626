"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Multi-chip sharding is exercised without TPU hardware by asking XLA for 8
host-platform devices; every test (including single-device ones) runs on CPU
so the suite is hermetic and fast. Must run before jax initializes a backend.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(42)
