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
