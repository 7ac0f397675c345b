"""Test harness: run everything on the CPU backend with 8 virtual devices.

The jax CPU backend is the "fake backend" the reference lacks (SURVEY.md §4):
all kernel-equivalents are pure functions testable without a TPU, and the
8-device host platform emulates a v4-8 slice for sharding tests.
"""

import os

# The environment pre-exports JAX_PLATFORMS=axon (remote TPU tunnel); running
# unit tests over per-op RPC is pathologically slow, so force the local CPU
# backend.  Env vars alone are not enough — the config update below wins.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
