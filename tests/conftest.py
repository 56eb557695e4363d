"""Test configuration: force an 8-device virtual CPU platform.

Tests must run without TPU hardware (CI) and need multiple devices to exercise the
sharding paths; jax is pre-imported by the environment's sitecustomize, so the
platform switch goes through jax.config (effective until first backend use).
"""

import os
import re

_FLAG = "--xla_force_host_platform_device_count"
_flags = os.environ.get("XLA_FLAGS", "")
_m = re.search(re.escape(_FLAG) + r"=(\d+)", _flags)
if _m is None:
    os.environ["XLA_FLAGS"] = (_flags + f" {_FLAG}=8").strip()
elif _m.group(1) != "8":
    # a pre-set different count would make every make_mesh(8) test fail with
    # a confusing 'available devices' error — diagnose it here instead
    # (parse the NUMBER: a substring check let counts like 80 through)
    raise RuntimeError(
        f"XLA_FLAGS pins a virtual device count != 8; the suite needs 8 "
        f"(got XLA_FLAGS={_flags!r})")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture()
def rng():
    """Function-scoped so every test draws the SAME stream whether it runs in
    isolation, in the full suite, or under xdist — a session-scoped shared
    generator made data-dependent failures unreproducible in isolation."""
    import numpy as np

    return np.random.default_rng(0)
