"""Test configuration: force an 8-device virtual CPU mesh.

Real multi-chip TPU hardware is not available in CI; all sharding tests run
against XLA's host-platform device emulation. These env vars must be set
before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A site plugin may have force-registered an accelerator backend and set
# jax_platforms itself; insist on the virtual CPU mesh for tests.
jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8 and jax.devices()[0].platform == "cpu", \
    f"tests require the 8-device CPU mesh, got {jax.devices()}"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(10)
