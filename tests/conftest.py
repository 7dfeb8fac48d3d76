"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Multi-chip sharding paths are exercised without a TPU pod via
``--xla_force_host_platform_device_count=8`` (see SURVEY.md §4).  This must
run before jax is imported anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
