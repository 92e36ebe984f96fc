"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharded code paths are
validated on `--xla_force_host_platform_device_count=8` exactly as the
driver's `dryrun_multichip` does. Env vars must be set before jax initializes.
"""

import os

# Force (not setdefault): the shell may carry JAX_PLATFORMS=axon/tpu, which
# would silently run the whole suite through the remote-TPU tunnel — slow and
# non-hermetic. The suite is designed for the virtual CPU mesh; TPU-specific
# measurement lives in bench.py.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
