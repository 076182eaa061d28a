"""Pallas banded-sampler kernel vs the XLA reference path (interpret mode on
CPU; the compiled kernel is exercised on real TPU by bench/verification)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from microaligner_tpu.ops.pallas_sample import pallas_sample_displaced
from microaligner_tpu.ops.warp import sample_displaced_batched


@pytest.mark.parametrize("shape", [(2, 96, 96), (1, 100, 130), (3, 37, 51)])
def test_matches_xla_banded(rng, shape):
    img = jnp.asarray(rng.random(shape), jnp.float32)
    flow = jnp.asarray((rng.random(shape + (2,)) - 0.5) * 4, jnp.float32)
    out = np.asarray(
        pallas_sample_displaced(img, flow[..., 0], flow[..., 1], band=4, interpret=True)
    )
    ref = np.asarray(sample_displaced_batched(img[..., None], flow, band=4))[..., 0]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sparse_offsets(rng):
    """Outlier pixels stretch the scalar offset ranges; the range-gated
    column loop must remain exact for non-contiguous displacements."""
    shape = (1, 96, 96)
    img = jnp.asarray(rng.random(shape), jnp.float32)
    flow = jnp.asarray((rng.random(shape + (2,)) - 0.5) * 1.0, jnp.float32)
    flow = flow.at[0, 20, 30, 0].set(3.4).at[0, 60, 70, 1].set(-3.8)
    out = np.asarray(
        pallas_sample_displaced(img, flow[..., 0], flow[..., 1], band=4, interpret=True)
    )
    ref = np.asarray(sample_displaced_batched(img[..., None], flow, band=4))[..., 0]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_multi_col_block(rng):
    """Lane-blocked grid (col_block=128 forces >1 column block): block seams
    must be invisible.  Guards the 2026-08-18 scoped-VMEM fix."""
    shape = (1, 64, 300)
    img = jnp.asarray(rng.random(shape), jnp.float32)
    flow = jnp.asarray((rng.random(shape + (2,)) - 0.5) * 12, jnp.float32)
    out = np.asarray(
        pallas_sample_displaced(
            img, flow[..., 0], flow[..., 1], band=7, interpret=True, col_block=128
        )
    )
    ref = np.asarray(sample_displaced_batched(img[..., None], flow, band=7))[..., 0]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_zero_flow_identity(rng):
    img = jnp.asarray(rng.random((1, 64, 64)), jnp.float32)
    z = jnp.zeros((1, 64, 64), jnp.float32)
    out = np.asarray(pallas_sample_displaced(img, z, z, band=4, interpret=True))
    np.testing.assert_allclose(out, np.asarray(img), atol=1e-6)
