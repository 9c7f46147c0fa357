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

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1037)
