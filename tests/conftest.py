"""Test configuration: force an 8-device virtual CPU platform.

Tests must run without TPU hardware (CI) and need multiple devices to exercise the
sharding paths; jax is pre-imported by the environment's sitecustomize, so the
platform switch goes through jax.config (effective until first backend use).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(0)
