"""Pallas TPU kernels: banded Gaussian window aggregation (+ fused 2x2 solve).

The Farneback window aggregation (reference compute: the
FarnebackUpdateFlow_GaussianBlur stage behind cv.calcOpticalFlowFarneback,
winsize ~= tile overlap, e.g. 99 taps) is the FLOP-heavy stage of the flow
engine.  A dense (L, L) matmul wastes ~(1 - winsize/L) of the MXU on the
empty band, and XLA's block-banded einsum forms lose 2-4x to layout copies.
These kernels stream each input block through VMEM exactly once and contract
only the 3 aligned 128-blocks the band touches:

* pass 1 smooths along W:  out[., i] = sum_j Dw[j, i] x[., j]
* pass 2 smooths along H and fuses the per-pixel 2x2 normal-equation solve
  into the epilogue, emitting flow_x/flow_y directly (2 planes written
  instead of 5).

Requires winsize//2 <= 128 (one halo block per side); callers gate on this
and fall back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_smooth5_solve", "pallas_smooth_w"]

_B = 128  # lane-aligned block edge
_HB = 256  # rows per pass-1 grid step


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.lru_cache(maxsize=None)
def _band_factors(length: int, winsize: int):
    """(nblocks, 3*_B, _B) slab factors of the banded smooth operator.

    factor[c][j, i] = D[c*_B - _B + j, c*_B + i] where D is the dense
    replicate-padded Gaussian operator (zero outside [0, length)²), so an
    output block c is slab(c) @ factor[c] with slab(c) = x[c*_B-_B : c*_B+2_B].
    """
    from microaligner_tpu.optflow.farneback import _banded_smooth_matrix

    D = _banded_smooth_matrix(length, winsize)
    nb = _cdiv(length, _B)
    out = np.zeros((nb, 3 * _B, _B), np.float32)
    for c in range(nb):
        for jj in range(3 * _B):
            src = c * _B - _B + jj
            if 0 <= src < length:
                ncols = min(_B, length - c * _B)
                out[c, jj, :ncols] = D[src, c * _B : c * _B + ncols]
    return out


@functools.lru_cache(maxsize=None)
def _band_factors_t(length: int, winsize: int):
    """Pass-2 factors, pre-transposed on the host: (nblocks, _B, 3*_B)."""
    f = _band_factors(length, winsize)
    return np.ascontiguousarray(np.swapaxes(f, 1, 2))


def _prec():
    from microaligner_tpu.optflow.farneback import _agg_precision

    p = _agg_precision()
    # Mosaic's dot lowering only knows DEFAULT and HIGHEST; the kernels are
    # HBM-bound, so rounding HIGH up to HIGHEST costs ~nothing here
    if p == jax.lax.Precision.HIGH:
        return jax.lax.Precision.HIGHEST
    return p


@functools.partial(jax.jit, static_argnames=("winsize", "interpret"))
def pallas_smooth_w(x: jax.Array, winsize: int, interpret: bool = False) -> jax.Array:
    """Smooth (N, C, H, W) along W with the banded Gaussian operator."""
    n, c, h, w = x.shape
    assert winsize // 2 <= _B
    f = jnp.asarray(_band_factors(w, winsize))
    nbw = f.shape[0]
    wp = nbw * _B
    hb = min(_HB, h)
    hpad = (-h) % hb
    # one zero halo block each side so the 3 consecutive views cover the band
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, hpad), (_B, wp - w + _B)))
    hp = h + hpad
    grid = (n, hp // hb, nbw)

    def view(k):
        return pl.BlockSpec(
            (1, c, hb, _B), lambda i, r, cc: (i, 0, r, cc + k), memory_space=pltpu.VMEM
        )

    fac_spec = pl.BlockSpec((1, 3 * _B, _B), lambda i, r, cc: (cc, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, c, hb, _B), lambda i, r, cc: (i, 0, r, cc), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_w_kernel, c, hb, _prec()),
        out_shape=jax.ShapeDtypeStruct((n, c, hp, wp), jnp.float32),
        grid=grid,
        in_specs=[view(0), view(1), view(2), fac_spec],
        out_specs=out_spec,
        interpret=interpret,
    )(xp, xp, xp, f)
    return out[:, :, :h, :w]


def _w_kernel(c, hb, prec, xa_ref, xb_ref, xc_ref, f_ref, out_ref):
    slab = jnp.concatenate([xa_ref[0], xb_ref[0], xc_ref[0]], axis=2)  # (c, hb, 3B)
    fac = f_ref[0]  # (3B, B)
    lhs = slab.reshape(c * hb, 3 * _B)
    y = jax.lax.dot_general(
        lhs, fac, (((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )
    out_ref[0] = y.reshape(c, hb, _B)


@functools.partial(jax.jit, static_argnames=("winsize", "interpret"))
def pallas_smooth5_solve(M: jax.Array, winsize: int, interpret: bool = False):
    """Full window aggregation + 2x2 solve: (N, 5, H, W) -> (fx, fy).

    Pass 1 smooths W; pass 2 smooths H and solves the per-pixel normal
    equations in its epilogue (matching _update_flow_gaussian_cf numerics).
    """
    n, c, h, w = M.shape
    assert c == 5
    s1 = pallas_smooth_w(M, winsize, interpret=interpret)

    f = jnp.asarray(_band_factors_t(h, winsize))
    nbh = f.shape[0]
    hp = nbh * _B
    wb = min(2 * _B, w)
    wpad = (-w) % wb
    s1p = jnp.pad(s1, ((0, 0), (0, 0), (_B, hp - h + _B), (0, wpad)))
    wp = w + wpad
    grid = (n, nbh, wp // wb)

    def view(k):
        return pl.BlockSpec(
            (1, 5, _B, wb), lambda i, r, cc: (i, 0, r + k, cc), memory_space=pltpu.VMEM
        )

    fac_spec = pl.BlockSpec((1, _B, 3 * _B), lambda i, r, cc: (r, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, _B, wb), lambda i, r, cc: (i, r, cc), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((n, hp, wp), jnp.float32)
    fx, fy = pl.pallas_call(
        functools.partial(_h_solve_kernel, wb, _prec()),
        out_shape=(shape, shape),
        grid=grid,
        in_specs=[view(0), view(1), view(2), fac_spec],
        out_specs=(out_spec, out_spec),
        interpret=interpret,
    )(s1p, s1p, s1p, f)
    return fx[:, :h, :w], fy[:, :h, :w]


def _h_solve_kernel(wb, prec, xa_ref, xb_ref, xc_ref, f_ref, fx_ref, fy_ref):
    slab = jnp.concatenate([xa_ref[0], xb_ref[0], xc_ref[0]], axis=1)  # (5, 3B, wb)
    lhs = f_ref[0]  # (B, 3B), pre-transposed: out[i, w] = sum_j lhs[i, j] slab[j, w]
    sm = [
        jax.lax.dot_general(
            lhs, slab[ch], (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32,
        )
        for ch in range(5)
    ]  # 5 x (B, wb)
    g11, g12, g22, h1, h2 = sm
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    fx_ref[0] = (g11 * h2 - g12 * h1) * idet
    fy_ref[0] = (g22 * h1 - g12 * h2) * idet
