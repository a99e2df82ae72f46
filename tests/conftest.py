"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax import.

Multi-chip sharding (pjit over a Mesh) is validated on a virtual CPU mesh —
real TPU hardware in CI has a single chip.  These env vars must be set before
the first ``import jax`` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The machine's axon sitecustomize re-registers the TPU plugin and overwrites
# jax_platforms at import time; force CPU back before the backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
