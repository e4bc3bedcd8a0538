"""Test configuration: force JAX onto a virtual 8-device CPU mesh so the
multi-device (pjit/shard_map) paths run without TPU hardware.

Must set the env vars before jax is imported anywhere.
"""

import os
import sys

# The shell env pins JAX_PLATFORMS=axon (the tunneled TPU). Tests must run
# on the virtual CPU mesh: override unconditionally. The env var alone is
# NOT enough — importing pytest already imports jax (plugin discovery), so
# jax's config snapshot predates this file; update the live config too.
# This works as long as no backend has been initialised yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# persistent compile cache: model-sized CPU test compiles take minutes on
# this 1-core host; repeat runs of unchanged HLO become instant
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
