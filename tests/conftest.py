"""Test configuration: force CPU backend with 8 virtual devices so the
multi-chip sharding paths (mesh/pjit/shard_map) are exercised without TPU
hardware, mirroring the driver's dryrun_multichip harness.

Note: this environment's sitecustomize registers an `axon` TPU PJRT plugin
that overrides JAX_PLATFORMS env; `jax.config.update` after import wins, so
we force the platform here before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE: the persistent compilation cache (jax_compilation_cache_dir) is
# deliberately NOT enabled: in this image XLA:CPU AOT deserialization is
# unreliable (machine-feature mismatch -> SIGILL/segfault reading back
# entries, observed as "Fatal Python error" inside
# compilation_cache.get_executable_and_time).  In-process jit caching
# still applies; cross-process caching is not worth a crashing suite.

import gc  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _free_jax_memory_between_modules():
    """Drop compiled executables between test modules.

    The full ladder compiles hundreds of XLA programs in one process; the
    accumulated executables + their bound constants eventually segfault
    XLA:CPU's compiler late in the run (observed in the sharded-BA module
    at ~60% of the suite).  Clearing per module trades some recompilation
    for a suite that cannot tip over the process memory limit."""
    yield
    jax.clear_caches()
    gc.collect()
