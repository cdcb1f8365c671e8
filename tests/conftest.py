"""Test harness config.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding logic is
exercised without TPU hardware (the strategy SURVEY.md §4 prescribes). The
env vars must be set before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The env var alone is not enough when a platform plugin (axon) pre-set
# JAX_PLATFORMS in the environment; the config update wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long e2e tests (>=15 s each). `pytest -m 'not slow'` is the "
        "fast iteration loop (<5 min quiet); scripts/check.sh runs all.",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
