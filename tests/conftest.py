"""Test configuration: run everything on a virtual 8-device CPU mesh so CI
needs no TPU (SURVEY.md §4: multi-chip tests via
xla_force_host_platform_device_count)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize may have pre-registered a TPU backend with
# JAX_PLATFORMS latched; force the CPU platform explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
