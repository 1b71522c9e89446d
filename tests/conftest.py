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
# persistent compilation cache: the estimator stack compiles ~20 sizable
# XLA programs; caching them across test processes cuts minutes per run
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
