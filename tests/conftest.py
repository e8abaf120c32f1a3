"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests run without TPU hardware (SURVEY.md §4: multi-host tests via
xla_force_host_platform_device_count)."""

import os

# The image pre-imports jax (sitecustomize) with JAX_PLATFORMS=axon (TPU
# tunnel); override both the env var and the live config so tests run on the
# local CPU with 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"


@pytest.fixture
def rng():
    return np.random.RandomState(42)
