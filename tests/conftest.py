"""Test configuration: force JAX onto a virtual 8-device CPU mesh so the
multi-device (pjit/shard_map) paths run without TPU hardware.

Must set the env vars before jax is imported anywhere.
"""

import os
import sys

# The shell env pins JAX_PLATFORMS=axon (the tunneled TPU). Tests must run
# on the virtual CPU mesh: override unconditionally, before jax imports.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
