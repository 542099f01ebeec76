"""Test environment: force an 8-device virtual CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4 "mesh tests ... to
simulate multi-device DP").

Note: the environment's sitecustomize pre-imports jax and registers a remote
TPU backend; backend *selection* is lazy, so overriding ``jax_platforms``
before the first device query is sufficient (and avoids a ~20s tunnel
handshake per test process)."""

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
    return np.random.RandomState(0)
