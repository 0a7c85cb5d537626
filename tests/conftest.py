"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Multi-chip sharding is exercised without TPU hardware by asking XLA for 8
host-platform devices; every test (including single-device ones) runs on CPU
so the suite is hermetic and fast. Must run before jax initializes a backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session env pins a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the session's TPU plugin re-asserts itself over JAX_PLATFORMS; the config
# update is authoritative
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# build the native C++ decoder once so its 15 tests never silently skip on a
# fresh checkout (a few seconds of g++; on failure the skipif stands)
try:
    from geomapnet_tpu import native as _native

    if not _native.lib_path().exists():
        from geomapnet_tpu.native.build import build as _build_native

        _build_native(verbose=False)
except Exception:
    pass


@pytest.fixture
def rng():
    return np.random.RandomState(42)
