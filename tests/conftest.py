"""Test harness config: run JAX on CPU with 8 virtual devices so sharding
tests exercise a multi-device mesh without TPU hardware (SURVEY.md §4e).

NOTE: this environment's sitecustomize imports jax at interpreter startup
(registering a TPU plugin and pinning JAX_PLATFORMS), so env vars set here
are too late — we must override through jax.config, which works because
backends initialize lazily on first use.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
