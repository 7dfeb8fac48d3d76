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

import jax  # noqa: E402

# The environment may pre-import jax and pin another platform (e.g. a TPU
# tunnel) via sitecustomize; config.update overrides it reliably.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: repeat test runs skip XLA recompiles.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
# The serving CLIs default their --compile-cache here too (in-process
# calls and spawned daemons alike) instead of touching ~/.cache.
os.environ.setdefault("OSI_COMPILE_CACHE", _cache_dir)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
