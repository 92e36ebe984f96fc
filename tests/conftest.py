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

# The axon sitecustomize (remote-TPU tunnel) registers its PJRT plugin at
# interpreter start and force-sets jax_platforms="axon,cpu", overriding the
# env var above — which would silently run the suite through the tunnel.
# Re-assert CPU via the config API (jax is imported but no backend is
# initialized yet, so this still takes effect).
jax.config.update("jax_platforms", "cpu")

# NO persistent compilation cache: XLA:CPU executable serialization
# (compilation_cache.put_executable_and_time) segfaults sporadically on this
# jaxlib for the large fused-scan programs, and AOT entries are
# machine-feature-specific (cross-host reuse can SIGILL). Warm-compile time
# is the price of a deterministic suite.
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _bounded_compile_memory():
    """Free compiled executables between test modules. The suite has grown
    past the point where one process can hold every module's XLA:CPU
    executables: at ~7 GB RSS this jaxlib segfaults sporadically INSIDE
    backend_compile_and_load (observed on test_pose_graph late in a full
    run; the same class of bug as the serialization crash above). Modules
    rarely share compiled programs, so per-module recompiles cost little."""
    yield
    jax.clear_caches()
