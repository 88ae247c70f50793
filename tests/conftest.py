"""Test config: force an 8-virtual-device CPU backend before JAX import.

This is the JAX analogue of a fake distributed backend — multi-chip sharding
tests run on any host (SURVEY.md §4(d))."""
import os

# Force-override: the environment exports JAX_PLATFORMS=axon and a
# sitecustomize that registers the TPU tunnel when PALLAS_AXON_POOL_IPS is
# set; tests must run on the virtual-8-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The sitecustomize imports jax before this file runs, so env vars alone are
# not enough — update the already-parsed config too (must happen before any
# backend use, or everything silently runs through the TPU tunnel).
import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeated suite runs skip recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/pdae_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
