"""Test harness config: force an 8-device virtual CPU platform.

All tests run on CPU (Pallas kernels via interpret mode) so the suite is
hermetic; multi-device sharding tests use the 8 virtual devices
(SURVEY.md §4.5). Must set env vars before the first jax import.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test (full CLI journeys)")

# The axon TPU plugin in this image overrides JAX_PLATFORMS from the
# environment; the config knob wins, so set it explicitly too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
