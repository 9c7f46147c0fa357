"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are exercised on host CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8) — the standard JAX
answer to testing distributed code without a TPU slice. The environment's
axon site hook force-sets JAX_PLATFORMS=axon, so we must override via
jax.config after import, before any backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the model-graph compiles dominate test time;
# cache them across test processes.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1037)
