"""Test configuration: force CPU with 8 virtual devices so multi-device
sharding tests run without TPU hardware (SURVEY.md §4 TPU build implication d)."""

import os

# must be set before jax initializes its backends
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin force-prepends itself to jax_platforms, overriding
# JAX_PLATFORMS=cpu; pin it back explicitly so tests never touch the chip.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


MATRICES_DIR = "/root/reference/matrices"


def matrix_path(name: str) -> str:
    return os.path.join(MATRICES_DIR, name)
