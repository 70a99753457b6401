"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-device sharding code is exercised without TPU hardware via
``--xla_force_host_platform_device_count`` (the standard substitute for a
fake multi-node backend; see SURVEY.md §4).

Note: the environment pins ``JAX_PLATFORMS=axon`` (remote TPU tunnel with
network-round-trip compiles) via a sitecustomize hook that runs before
pytest, so we must force the CPU platform through ``jax.config`` — env
vars alone are overridden.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
