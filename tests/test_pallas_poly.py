"""Mosaic fused polynomial expansion vs the XLA path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from microaligner_tpu.ops.pallas_poly import pallas_poly_exp5


def _want(imgs):
    from microaligner_tpu.optflow.farneback import _poly_exp_cf, _pre_smooth

    return jax.vmap(lambda x: _poly_exp_cf(_pre_smooth(x), 1, 1.7))(imgs)


@pytest.mark.parametrize("h,w", [(70, 96), (130, 260), (256, 128)])
def test_matches_xla(rng, h, w):
    from microaligner_tpu.optflow.farneback import _poly_coeff_tuple, _pre_smooth

    imgs = jnp.asarray(rng.random((2, h, w)) * 255, jnp.float32)
    s = jax.vmap(_pre_smooth)(imgs)
    sp = jnp.pad(s, ((0, 0), (1, 1), (1, 1)), mode="edge")
    got = np.asarray(pallas_poly_exp5(sp, _poly_coeff_tuple(1, 1.7), interpret=True))
    want = np.asarray(_want(imgs))
    np.testing.assert_allclose(got, want, atol=1e-3)


@pytest.mark.parametrize("h,w", [(70, 300), (40, 257)])
def test_matches_xla_multi_col_block(rng, h, w):
    """Lane-blocked grid (col_block=128 forces >1 column block): the block
    seams introduced by the 2026-08-18 VMEM fix must be invisible."""
    from microaligner_tpu.optflow.farneback import _poly_coeff_tuple, _pre_smooth

    imgs = jnp.asarray(rng.random((2, h, w)) * 255, jnp.float32)
    s = jax.vmap(_pre_smooth)(imgs)
    sp = jnp.pad(s, ((0, 0), (1, 1), (1, 1)), mode="edge")
    got = np.asarray(
        pallas_poly_exp5(sp, _poly_coeff_tuple(1, 1.7), interpret=True, col_block=128)
    )
    want = np.asarray(_want(imgs))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_pair_m_multi_col_block(rng):
    """Pair kernel across >1 column AND row block: R0/R1/M0 all seam-free,
    and the in-kernel iota (edge scales, inb mask) uses GLOBAL coordinates."""
    from microaligner_tpu.ops.pallas_poly import pallas_poly_pair_m
    from microaligner_tpu.optflow.farneback import (
        _poly_coeff_tuple,
        _poly_exp_cf,
        _pre_smooth,
        _update_matrices_zero_flow_cf,
    )

    movs = jnp.asarray(rng.random((1, 70, 300)) * 255, jnp.float32)
    refs = jnp.asarray(rng.random((1, 70, 300)) * 255, jnp.float32)
    s0 = jax.vmap(_pre_smooth)(movs)
    s1 = jax.vmap(_pre_smooth)(refs)
    sp0 = jnp.pad(s0, ((0, 0), (1, 1), (1, 1)), mode="edge")
    sp1 = jnp.pad(s1, ((0, 0), (1, 1), (1, 1)), mode="edge")
    r0g, r1g, mg = pallas_poly_pair_m(
        sp0, sp1, _poly_coeff_tuple(1, 1.7), interpret=True, col_block=128
    )

    r0w = jax.vmap(lambda x: _poly_exp_cf(_pre_smooth(x), 1, 1.7))(movs)
    r1w = jax.vmap(lambda x: _poly_exp_cf(_pre_smooth(x), 1, 1.7))(refs)
    mw = jax.vmap(_update_matrices_zero_flow_cf)(r0w, r1w)
    np.testing.assert_allclose(np.asarray(r0g), np.asarray(r0w), atol=1e-3)
    np.testing.assert_allclose(np.asarray(r1g), np.asarray(r1w), atol=1e-3)
    np.testing.assert_allclose(np.asarray(mg), np.asarray(mw), rtol=1e-3, atol=1e-3)


def test_pair_m_matches_xla(rng):
    """Fused pair expansion + zero-flow combine vs the XLA path (interpret)."""
    import jax

    from microaligner_tpu.ops.pallas_poly import pallas_poly_pair_m
    from microaligner_tpu.optflow.farneback import (
        _poly_coeff_tuple,
        _poly_exp_cf,
        _pre_smooth,
        _update_matrices_zero_flow_cf,
    )

    movs = jnp.asarray(rng.random((2, 50, 70)) * 255, jnp.float32)
    refs = jnp.asarray(rng.random((2, 50, 70)) * 255, jnp.float32)
    s0 = jax.vmap(_pre_smooth)(movs)
    s1 = jax.vmap(_pre_smooth)(refs)
    sp0 = jnp.pad(s0, ((0, 0), (1, 1), (1, 1)), mode="edge")
    sp1 = jnp.pad(s1, ((0, 0), (1, 1), (1, 1)), mode="edge")
    r0g, r1g, mg = pallas_poly_pair_m(sp0, sp1, _poly_coeff_tuple(1, 1.7), interpret=True)

    r0w = jax.vmap(lambda x: _poly_exp_cf(_pre_smooth(x), 1, 1.7))(movs)
    r1w = jax.vmap(lambda x: _poly_exp_cf(_pre_smooth(x), 1, 1.7))(refs)
    mw = jax.vmap(_update_matrices_zero_flow_cf)(r0w, r1w)
    np.testing.assert_allclose(np.asarray(r0g), np.asarray(r0w), atol=1e-3)
    np.testing.assert_allclose(np.asarray(r1g), np.asarray(r1w), atol=1e-3)
    np.testing.assert_allclose(np.asarray(mg), np.asarray(mw), rtol=1e-3, atol=1e-3)


def test_pair_m_bf16_r_storage(rng):
    """r_dtype=bf16: R0/R1 are emitted rounded; M0 is combined from the
    pre-rounding f32 values (same contract as the XLA path's f32 combine)."""
    import jax

    from microaligner_tpu.ops.pallas_poly import pallas_poly_pair_m
    from microaligner_tpu.optflow.farneback import (
        _poly_coeff_tuple,
        _poly_exp_cf,
        _pre_smooth,
        _update_matrices_zero_flow_cf,
    )

    movs = jnp.asarray(rng.random((2, 50, 70)) * 255, jnp.float32)
    refs = jnp.asarray(rng.random((2, 50, 70)) * 255, jnp.float32)
    s0 = jax.vmap(_pre_smooth)(movs)
    s1 = jax.vmap(_pre_smooth)(refs)
    sp0 = jnp.pad(s0, ((0, 0), (1, 1), (1, 1)), mode="edge")
    sp1 = jnp.pad(s1, ((0, 0), (1, 1), (1, 1)), mode="edge")
    r0g, r1g, mg = pallas_poly_pair_m(
        sp0, sp1, _poly_coeff_tuple(1, 1.7), r_dtype=jnp.bfloat16, interpret=True
    )
    assert r0g.dtype == jnp.bfloat16 and r1g.dtype == jnp.bfloat16

    r0w = jax.vmap(lambda x: _poly_exp_cf(_pre_smooth(x), 1, 1.7))(movs)
    r1w = jax.vmap(lambda x: _poly_exp_cf(_pre_smooth(x), 1, 1.7))(refs)
    mw = jax.vmap(_update_matrices_zero_flow_cf)(r0w, r1w)
    # kernel f32 pre-rounding values may straddle a bf16 grid boundary vs the
    # XLA reference -> relative bar (1 ulp ~ 0.4%)
    np.testing.assert_allclose(
        np.asarray(r0g, np.float32), np.asarray(r0w.astype(jnp.bfloat16), np.float32),
        rtol=1e-2, atol=0.1,
    )
    np.testing.assert_allclose(
        np.asarray(r1g, np.float32), np.asarray(r1w.astype(jnp.bfloat16), np.float32),
        rtol=1e-2, atol=0.1,
    )
    np.testing.assert_allclose(np.asarray(mg), np.asarray(mw), rtol=1e-3, atol=1e-3)
