"""Test harness config.

Default lane: run JAX on CPU with 8 virtual devices so sharding tests
exercise a multi-device mesh without TPU hardware (SURVEY.md §4e) and
Pallas kernels run in interpret mode.

Hardware lane: ``ART_TPU_TESTS=1 python -m pytest -m tpu`` keeps the real
TPU platform and runs only the ``tpu``-marked tests (tests/test_tpu_lane.
py) — compiled Mosaic kernels, the PallasBackend forward vs dense, a
sharded step, and an orchestrator tick on the actual chip. Without the
env var, tpu-marked tests are skipped and everything else stays CPU.

NOTE: this environment's sitecustomize imports jax at interpreter startup
(registering a TPU plugin and pinning JAX_PLATFORMS), so env vars set here
are too late — we must override through jax.config, which works because
backends initialize lazily on first use.
"""

import os

RUN_TPU = os.environ.get("ART_TPU_TESTS") == "1"

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()

import jax

if not RUN_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    skip_tpu = pytest.mark.skip(
        reason="TPU hardware lane: run with ART_TPU_TESTS=1 -m tpu")
    skip_cpu = pytest.mark.skip(
        reason="CPU lane test (needs the virtual-device mesh; run "
               "without ART_TPU_TESTS)")
    for item in items:
        if "tpu" in item.keywords and not RUN_TPU:
            item.add_marker(skip_tpu)
        elif "tpu" not in item.keywords and RUN_TPU:
            # The CPU suite assumes the cpu platform / 8-device mesh;
            # don't run it against the single TPU chip.
            item.add_marker(skip_cpu)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
