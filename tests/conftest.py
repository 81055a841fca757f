"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths compile
and execute without TPU hardware. The env vars must be set before jax
initializes its backends, hence this happens at conftest import time.
"""

import os

# Force CPU regardless of what the host env selects (e.g. JAX_PLATFORMS=axon
# for the tunneled TPU): unit tests must be hermetic and fast, and fp32 parity
# tests need true-fp32 matmuls, which TPU MXU paths don't give by default.
# The axon sitecustomize re-registers its platform via jax.config.update at
# interpreter start, so the env var alone is not enough — reset the config
# after importing jax (backends initialize lazily, so this is still in time).
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_root():
    path = "/root/reference/MulticoreMainProject"
    if not os.path.isdir(path):
        pytest.skip("reference tree not mounted")
    return path
