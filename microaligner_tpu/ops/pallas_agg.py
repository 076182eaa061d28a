"""Pallas TPU kernels: banded Gaussian window aggregation (+ fused 2x2 solve).

The Farneback window aggregation (reference compute: the
FarnebackUpdateFlow_GaussianBlur stage behind cv.calcOpticalFlowFarneback,
winsize ~= tile overlap, e.g. 99 taps) is the FLOP-heavy stage of the flow
engine.  A dense (L, L) matmul wastes ~(1 - winsize/L) of the MXU on the
empty band, and XLA's block-banded einsum forms lose 2-4x to layout copies.

Both passes stream every HBM block exactly ONCE: the three overlapping
128-block views the band needs are assembled in a VMEM ring slab that shifts
one block per grid step (two warm-up steps per row/column sweep), instead of
declaring three overlapping BlockSpec views that each re-fetch the same data.
Out-of-range band blocks are never materialized: the operator factors are
zero for source indices outside [0, length) (see _band_factors), so the ring
simply re-fetches a clamped in-range block and multiplies it by zeros.

* pass 1 smooths along W:  out[., i] = sum_j Dw[j, i] x[., j]; its output
  keeps the padded (hp, wp) geometry so pass 2 reads it with no pad copy.
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

from microaligner_tpu.ops.pallas_params import compiler_params

__all__ = ["pallas_smooth5_solve", "pallas_smooth_w"]

_B = 128  # lane-aligned block edge
_HB = 256  # rows per pass-1 grid step (measured best on v5e; 512 is ~5% slower)


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


def _prec(winsize: int):
    from microaligner_tpu.optflow.farneback import _agg_precision

    p = _agg_precision(winsize)
    # Mosaic's dot lowering only knows DEFAULT and HIGHEST; HIGH rounds up
    if p == jax.lax.Precision.HIGH:
        return jax.lax.Precision.HIGHEST
    return p


def _smooth_w_padded(x: jax.Array, winsize: int, interpret: bool = False) -> jax.Array:
    """Smooth (N, C, H, W) along W; returns the PADDED (N, C, hp, wp) result
    (hp/wp = 128-block round-ups) so pass 2 can consume it with no extra pad.
    Runs in the input's dtype (bf16 M storage halves both passes' traffic;
    the MXU accumulates in f32 either way)."""
    n, c, h, w = x.shape
    dt = x.dtype
    assert winsize // 2 <= _B
    f = jnp.asarray(_band_factors(w, winsize), dt)
    nbw = f.shape[0]
    wp = nbw * _B
    hb = min(_HB, h)
    hpad = (-h) % hb
    # one zero halo block each side; also zeroes the [w, wp) tail so ring
    # fetches of the last partial block read defined data
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, hpad), (_B, wp - w + _B)))
    hp = h + hpad
    grid = (n, hp // hb, nbw + 2)  # two ring warm-up steps per row sweep

    in_spec = pl.BlockSpec(
        (1, c, hb, _B), lambda i, r, s: (i, 0, r, s), memory_space=pltpu.VMEM
    )
    fac_spec = pl.BlockSpec(
        (1, 3 * _B, _B),
        lambda i, r, s: (jnp.maximum(s - 2, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, c, hb, _B),
        lambda i, r, s: (i, 0, r, jnp.maximum(s - 2, 0)),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_w_kernel_ring, c, hb, _prec(winsize)),
        out_shape=jax.ShapeDtypeStruct((n, c, hp, wp), dt),
        grid=grid,
        in_specs=[in_spec, fac_spec],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((c, hb, 3 * _B), dt)],
        # the ring axis (s) is stateful and must run in order; batch and row
        # sweeps are independent (each sweep re-warms the ring)
        compiler_params=compiler_params("parallel", "parallel", "arbitrary"),
        interpret=interpret,
    )(xp, f)
    return out


@functools.partial(jax.jit, static_argnames=("winsize", "interpret"))
def pallas_smooth_w(x: jax.Array, winsize: int, interpret: bool = False) -> jax.Array:
    """Smooth (N, C, H, W) along W with the banded Gaussian operator."""
    n, c, h, w = x.shape
    return _smooth_w_padded(x, winsize, interpret=interpret)[:, :, :h, :w]


def _w_kernel_ring(c, hb, prec, x_ref, f_ref, out_ref, slab_ref):
    s = pl.program_id(2)
    # shift the ring one block left, append the newly fetched block
    shifted = slab_ref[:, :, _B:]
    slab_ref[:, :, : 2 * _B] = shifted
    slab_ref[:, :, 2 * _B :] = x_ref[0]

    @pl.when(s >= 2)
    def _compute():
        lhs = slab_ref[...].reshape(c * hb, 3 * _B)
        y = jax.lax.dot_general(
            lhs, f_ref[0], (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32,
        )
        out_ref[0] = y.reshape(c, hb, _B).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("winsize", "interpret", "col_block"))
def pallas_smooth5_solve(
    M: jax.Array, winsize: int, interpret: bool = False, col_block: int | None = None
):
    """Full window aggregation + 2x2 solve: (N, 5, H, W) -> (fx, fy).

    Pass 1 smooths W; pass 2 smooths H and solves the per-pixel normal
    equations in its epilogue (matching _update_flow_gaussian_cf numerics).
    ``col_block`` overrides pass 2's per-step column width (lanes per grid
    step; must be a multiple of 128 — falls back to the widest multiple of
    _B that divides the padded width).
    """
    n, c, h, w = M.shape
    assert c == 5
    s1 = _smooth_w_padded(M, winsize, interpret=interpret)  # (n, 5, hp1, wp)
    hp1, wp = s1.shape[2], s1.shape[3]

    f = jnp.asarray(_band_factors_t(h, winsize), s1.dtype)
    nbh = f.shape[0]
    hp = nbh * _B
    if hp1 < hp:  # pass-1 row round-up (multiples of _HB) usually covers hp
        s1 = jnp.pad(s1, ((0, 0), (0, 0), (0, hp - hp1), (0, 0)))
    wb = col_block or 2 * _B
    while wp % wb:  # wp is always a multiple of _B
        wb -= _B
    grid = (n, wp // wb, nbh + 2)  # ring over row blocks, two warm-up steps

    nbh1 = s1.shape[2] // _B  # available row blocks in the pass-1 output

    in_spec = pl.BlockSpec(
        (1, 5, _B, wb),
        # fetch row block s-1 clamped in range: out-of-range band rows have
        # zero factors, so the clamped duplicate contributes nothing
        lambda i, cc, s: (i, 0, jnp.clip(s - 1, 0, nbh1 - 1), cc),
        memory_space=pltpu.VMEM,
    )
    fac_spec = pl.BlockSpec(
        (1, _B, 3 * _B),
        lambda i, cc, s: (jnp.maximum(s - 2, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, _B, wb),
        lambda i, cc, s: (i, jnp.maximum(s - 2, 0), cc),
        memory_space=pltpu.VMEM,
    )
    shape = jax.ShapeDtypeStruct((n, hp, wp), jnp.float32)
    fx, fy = pl.pallas_call(
        functools.partial(_h_solve_kernel_ring, wb, _prec(winsize)),
        out_shape=(shape, shape),
        grid=grid,
        in_specs=[in_spec, fac_spec],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[pltpu.VMEM((5, 3 * _B, wb), s1.dtype)],
        compiler_params=compiler_params("parallel", "parallel", "arbitrary"),
        interpret=interpret,
    )(s1, f)
    return fx[:, :h, :w], fy[:, :h, :w]


def _h_solve_kernel_ring(wb, prec, x_ref, f_ref, fx_ref, fy_ref, slab_ref):
    s = pl.program_id(2)
    shifted = slab_ref[:, _B:, :]
    slab_ref[:, : 2 * _B, :] = shifted
    slab_ref[:, 2 * _B :, :] = x_ref[0]

    @pl.when(s >= 2)
    def _compute():
        lhs = f_ref[0]  # (B, 3B): out[i, w] = sum_j lhs[i, j] slab[j, w]
        slab = slab_ref[...]
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
