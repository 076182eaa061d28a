"""Mosaic aggregation kernels vs the XLA block-banded path (interpret mode).

The fused smooth+solve kernels are gated on TPU by a compile-and-compare
self-test; these tests run the same comparison in Pallas interpret mode on
CPU so kernel regressions fail the suite instead of silently demoting the
TPU path to the XLA fallback.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from microaligner_tpu.ops.pallas_agg import pallas_smooth5_solve, pallas_smooth_w


def _xla_smooth(M, winsize, axis):
    from microaligner_tpu.optflow.farneback import _block_smooth_axis

    return _block_smooth_axis(M, winsize, axis)


@pytest.mark.parametrize("h,w,win", [(70, 100, 31), (140, 260, 51), (256, 128, 99)])
def test_smooth_w_matches_xla(rng, h, w, win):
    M = jnp.asarray(rng.random((2, 5, h, w)), jnp.float32)
    got = np.asarray(pallas_smooth_w(M, win, interpret=True))
    want = np.asarray(_xla_smooth(M, win, -1))
    np.testing.assert_allclose(got, want, atol=1e-4)


def _pipeline_matrices(rng, h, w):
    """Well-conditioned normal-equation matrices from the real pipeline —
    random M would have near-singular 2x2 systems whose solve amplifies
    benign f32 reduction-order differences into large flow diffs."""
    from microaligner_tpu.optflow.farneback import (
        _poly_exp_cf,
        _pre_smooth,
        _update_matrices_zero_flow_cf,
    )

    img = jnp.asarray(rng.random((h, w)) * 255, jnp.float32)
    mov = jnp.roll(img, 2, axis=1)
    r0 = _poly_exp_cf(_pre_smooth(mov), 1, 1.7)
    r1 = _poly_exp_cf(_pre_smooth(img), 1, 1.7)
    one = _update_matrices_zero_flow_cf(r0, r1)
    return jnp.stack([one, one * 1.25])


@pytest.mark.parametrize("h,w,win", [(70, 100, 31), (150, 260, 99)])
def test_smooth5_solve_matches_xla(rng, h, w, win):
    from microaligner_tpu.optflow.farneback import (
        _smooth5_mxu,
        _update_flow_gaussian_xla,
    )

    M = _pipeline_matrices(rng, h, w)
    fx, fy = pallas_smooth5_solve(M, win, interpret=True)
    rx, ry = _update_flow_gaussian_xla(M, win)
    # the 2x2 solve divides by det: near-singular pixels amplify benign f32
    # reduction-order differences unboundedly, so compare where conditioned
    s = np.asarray(_smooth5_mxu(M, win))
    det = np.abs(s[:, 0] * s[:, 2] - s[:, 1] ** 2 + 1e-3)
    ok = det > 1e-2
    assert ok.mean() > 0.9
    np.testing.assert_allclose(np.asarray(fx)[ok], np.asarray(rx)[ok], atol=1e-4)
    np.testing.assert_allclose(np.asarray(fy)[ok], np.asarray(ry)[ok], atol=1e-4)
