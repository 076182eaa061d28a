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


@pytest.fixture
def rng(request):
    """Per-test deterministic rng, seeded from the test's nodeid.

    A session-scoped shared generator made every test's data depend on which
    tests ran before it (a test could pass in the full suite and fail when its
    file was run alone).  crc32 of the nodeid is stable across processes
    (unlike hash(), which is salted)."""
    import zlib

    return np.random.default_rng(zlib.crc32(request.node.nodeid.encode()))


@pytest.fixture(autouse=True)
def _single_worker_default():
    """Default every test to a 1-device worker mesh.

    The production tiled ops shard over all visible devices by default; on
    this virtual 8-device CPU mesh (1 physical core) that would make every
    multi-tile test pay 8x oversubscription.  Sharded-equality tests opt in
    via set_number_of_workers explicitly."""
    from microaligner_tpu.utils.workers import set_number_of_workers

    set_number_of_workers(1)
    yield
    set_number_of_workers(0)
