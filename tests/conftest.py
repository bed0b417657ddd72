"""Test configuration: CPU backend with an 8-device virtual mesh and x64.

The reference validates every fast path against float64 dense oracles
(SURVEY §4); tests therefore run on the CPU backend with x64 enabled, and
multi-chip sharding tests use the 8 virtual host devices.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env image pins JAX_PLATFORMS=axon (remote TPU) in a way that wins over
# os.environ edits; the config update reliably forces the CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# dlopen h5py NOW, while the process map count is low: a full suite run
# accumulates tens of thousands of mmaps (one per XLA:CPU executable /
# buffer), and once past vm.max_map_count (default 65530) late .so loads
# die with "failed to map segment" and allocations with MemoryError.
# (Host mitigation: sysctl -w vm.max_map_count=1048576.)
try:  # pragma: no cover
    import h5py  # noqa: F401
except Exception:
    pass


@pytest.fixture
def rng():
    return np.random.default_rng(0)
