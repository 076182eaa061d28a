"""Test harness: force JAX onto a virtual 8-device CPU mesh.

Must run before jax is imported anywhere; pytest imports conftest first.
Benchmarks (bench.py) run outside pytest and use the real TPU.
"""

import os

# The session environment pins JAX_PLATFORMS=axon (the tunneled TPU); tests
# must run on a virtual 8-device CPU mesh instead, so override unconditionally.
os.environ["JAX_PLATFORMS"] = os.environ.get("MA_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
