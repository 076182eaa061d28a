"""Fused Mosaic matrix-update kernel vs the XLA reference path.

Runs in Pallas interpret mode (tests are on CPU); on real TPU hardware the
compiled kernel is additionally cross-checked by the lazy self-test gate in
optflow/farneback.py::_pallas_matrices_self_test.
"""

import jax.numpy as jnp
import numpy as np

from microaligner_tpu.ops.pallas_matrices import pallas_update_matrices
from microaligner_tpu.optflow.farneback import _update_matrices_banded_xla


def _mk(rng, n, h, w, flow_scale):
    R0 = jnp.asarray(rng.standard_normal((n, 5, h, w)), jnp.float32)
    R1 = jnp.asarray(rng.standard_normal((n, 5, h, w)), jnp.float32)
    fx = jnp.asarray((rng.random((n, h, w)) - 0.5) * flow_scale, jnp.float32)
    fy = jnp.asarray((rng.random((n, h, w)) - 0.5) * flow_scale, jnp.float32)
    return R0, R1, fx, fy


def test_matches_xla_path(rng):
    R0, R1, fx, fy = _mk(rng, 2, 64, 96, 6.0)
    got = np.asarray(pallas_update_matrices(R0, R1, fx, fy, band=4, interpret=True))
    want = np.asarray(_update_matrices_banded_xla(R0, R1, fx, fy, 4))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_row_block_remainder(rng):
    # H=50 exercises the hpad path (50 % 32 != 0)
    R0, R1, fx, fy = _mk(rng, 1, 50, 40, 4.0)
    got = np.asarray(pallas_update_matrices(R0, R1, fx, fy, band=4, interpret=True))
    want = np.asarray(_update_matrices_banded_xla(R0, R1, fx, fy, 4))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sparse_offsets(rng):
    """Non-contiguous integer displacements: a few outlier pixels stretch the
    scalar [lo, hi] ranges; the range-gated column loop must still be exact."""
    R0, R1, fx, fy = _mk(rng, 1, 64, 96, 1.0)
    fx = fx.at[0, 10, 20].set(3.7)
    fy = fy.at[0, 40, 50].set(-3.2)
    got = np.asarray(pallas_update_matrices(R0, R1, fx, fy, band=4, interpret=True))
    want = np.asarray(_update_matrices_banded_xla(R0, R1, fx, fy, 4))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_multi_col_block(rng):
    """Lane-blocked grid (col_block=128 forces >1 column block): block seams
    must be invisible and the in-kernel iota (edge scales, inb masks, sample
    windows) must use GLOBAL coordinates.  Guards the 2026-08-18 VMEM fix."""
    R0, R1, fx, fy = _mk(rng, 1, 64, 300, 6.0)
    got = np.asarray(
        pallas_update_matrices(R0, R1, fx, fy, band=4, interpret=True, col_block=128)
    )
    want = np.asarray(_update_matrices_banded_xla(R0, R1, fx, fy, 4))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_multi_col_block_band7(rng):
    """The production band (_BAND_PALLAS=7, pad=8) with lane blocking and a
    non-multiple width (wpad path)."""
    R0, R1, fx, fy = _mk(rng, 1, 48, 200, 12.0)
    got = np.asarray(
        pallas_update_matrices(R0, R1, fx, fy, band=7, interpret=True, col_block=128)
    )
    want = np.asarray(_update_matrices_banded_xla(R0, R1, fx, fy, 7))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_small_height_rejected():
    import pytest

    R0 = jnp.zeros((1, 5, 8, 32), jnp.float32)
    zf = jnp.zeros((1, 8, 32), jnp.float32)
    with pytest.raises(ValueError):
        pallas_update_matrices(R0, R0, zf, zf, band=4, interpret=True)


def test_bf16_storage_inputs(rng):
    """bf16 R0/R1 storage (_r_storage_dtype): the kernel converts its loads
    to f32, so kernel-vs-XLA stays tight on identical bf16-rounded inputs."""
    R0, R1, fx, fy = _mk(rng, 1, 64, 96, 4.0)
    R0 = R0.astype(jnp.bfloat16)
    R1 = R1.astype(jnp.bfloat16)
    got = np.asarray(pallas_update_matrices(R0, R1, fx, fy, band=4, interpret=True))
    want = np.asarray(_update_matrices_banded_xla(R0, R1, fx, fy, 4))
    assert got.dtype == np.float32  # out_dtype defaults to f32
    np.testing.assert_allclose(got, want, atol=1e-4)
