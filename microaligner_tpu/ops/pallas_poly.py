"""Pallas TPU kernel: fused Farneback polynomial expansion (poly_n=1).

The expansion correlates the pre-smoothed image with the 3-tap moment
kernels g/xg/xxg along both axes and combines six moment maps into the five
output channels (reference compute: FarnebackPolyExp behind
cv.calcOpticalFlowFarneback).  The XLA formulation materializes three row
maps plus six column maps in HBM (~10 ms per 25x1200² batch); this kernel
reads each pre-smoothed row block once and writes the five channels
directly — every tap is a STATIC +-1 slice (none of Mosaic's dynamic-rotate
hazards; see ops/pallas_matrices.py).

The caller supplies the pre-smoothed image padded by 1 replicated pixel on
each side (replicate borders, as OpenCV's expansion applies to each level).

Blocking: the grid tiles BOTH the sublane and the lane axis.  The original
full-width row blocks made the per-step scoped-VMEM footprint linear in the
image width, which blew the 16 MB scoped-vmem stack limit past ~2.5k lanes
(the 2026-08-18 on-hardware dense-band A/B crashed the remote compiler with
"Scoped allocation with size 17.64M ... exceeded scoped vmem limit" at
4096²; full-width row bands of a 20k canvas are ~20680 lanes).  Each (rb,
cb) output block reads a (rb+2, cb+2) input window assembled from the four
neighbouring block views — the same overlapping-views trick as the row
halo, applied to lanes too — so the footprint is constant in image size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microaligner_tpu.ops.pallas_params import compiler_params

__all__ = ["pallas_poly_exp5", "pallas_poly_pair_m"]

_ROW_BLOCK = 128
_PAIR_ROW_BLOCK = 32  # pair kernel holds 3 output stacks in VMEM -> smaller rb
_COL_BLOCK = 1024  # lane blocking keeps scoped VMEM constant in image width


def _blocks(h: int, w: int, rb_base: int, cb_base: int | None = None) -> tuple[int, int]:
    """(rb, cb) block shape: sublane-aligned rows, lane-aligned columns,
    clamped to the (padded) image so small inputs stay single-block."""
    rb = min(rb_base, -(-h // 8) * 8)
    cb = min(cb_base or _COL_BLOCK, -(-w // 128) * 128)
    return rb, cb


def _pad_for_views(x: jax.Array, h: int, w: int, rb: int, cb: int) -> jax.Array:
    """Zero-pad a (N, h+2, w+2) replicate-padded input so every (r+1, c+1)
    neighbour block view stays in bounds: rows to ceil(h/rb)*rb + rb, lanes
    to ceil(w/cb)*cb + cb.  The zero tail never reaches a kept output pixel
    (output (y, x) reads padded rows y..y+2, cols x..x+2, and outputs past
    (h, w) are cropped)."""
    hp = -(-h // rb) * rb
    wp = -(-w // cb) * cb
    return jnp.pad(x, ((0, 0), (0, hp + rb - (h + 2)), (0, wp + cb - (w + 2))))


def _view_specs(rb: int, cb: int):
    """The four overlapping (1, rb, cb) views covering a block's (rb+2,
    cb+2) input window, as BlockSpecs over the padded input."""
    return [
        pl.BlockSpec((1, rb, cb), lambda i, r, c: (i, r, c), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rb, cb), lambda i, r, c: (i, r + 1, c), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rb, cb), lambda i, r, c: (i, r, c + 1), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rb, cb), lambda i, r, c: (i, r + 1, c + 1), memory_space=pltpu.VMEM),
    ]


def _assemble_slab(refs) -> jax.Array:
    """Four (1, rb, cb) neighbour views -> one (2rb, 2cb) slab."""
    top = jnp.concatenate([refs[0][0], refs[2][0]], axis=1)
    bot = jnp.concatenate([refs[1][0], refs[3][0]], axis=1)
    return jnp.concatenate([top, bot], axis=0)


@functools.partial(jax.jit, static_argnames=("coeffs", "interpret", "col_block"))
def pallas_poly_exp5(
    sp: jax.Array, coeffs: tuple, interpret: bool = False,
    col_block: int | None = None,
) -> jax.Array:
    """(N, H+2, W+2) replicate-padded pre-smoothed image -> (N, 5, H, W).

    ``coeffs`` is the static tuple (g0, g1, xg1, xxg1, ig11, ig03, ig33,
    ig55) from the Gaussian applicability (farneback._poly_exp_coeffs).
    """
    n, hp2, wp2 = sp.shape
    h, w = hp2 - 2, wp2 - 2
    rb, cb = _blocks(h, w, _ROW_BLOCK, col_block)
    grid = (n, -(-h // rb), -(-w // cb))

    spp = _pad_for_views(sp, h, w, rb, cb)
    out_spec = pl.BlockSpec(
        (1, 5, rb, cb), lambda i, r, c: (i, 0, r, c), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel, rb, cb, coeffs),
        out_shape=jax.ShapeDtypeStruct((n, 5, -(-h // rb) * rb, -(-w // cb) * cb), jnp.float32),
        grid=grid,
        in_specs=_view_specs(rb, cb),
        out_specs=out_spec,
        # stateless per-step compute: fully parallel grid
        compiler_params=compiler_params("parallel", "parallel", "parallel"),
        interpret=interpret,
    )(spp, spp, spp, spp)
    return out[:, :, :h, :w]


def _moments5(rb, cb, coeffs, slab):
    """Shared 3x3 moment math: a (2rb, 2cb) slab whose top-left (rb+2,
    cb+2) window is the block's input -> the five expansion channels
    [b_y, b_x, A_yy, A_xx, A_xy], each (rb, cb)."""
    g0, g1, xg1, xxg1, ig11, ig03, ig33, ig55 = coeffs

    up = jax.lax.slice_in_dim(slab, 0, rb, axis=0)
    mid = jax.lax.slice_in_dim(slab, 1, rb + 1, axis=0)
    dn = jax.lax.slice_in_dim(slab, 2, rb + 2, axis=0)
    row0 = g1 * mid + g0 * (up + dn)          # g  (symmetric)
    row1 = xg1 * (dn - up)                     # xg (antisymmetric: [-xg1,0,xg1])
    row2 = xxg1 * (up + dn)                    # xxg ([xxg1,0,xxg1])

    def hpass(r, k0, k1, anti=False):
        lf = jax.lax.slice_in_dim(r, 0, cb, axis=1)
        md = jax.lax.slice_in_dim(r, 1, cb + 1, axis=1)
        rt = jax.lax.slice_in_dim(r, 2, cb + 2, axis=1)
        if anti:
            return k1 * (rt - lf)
        return k0 * md + k1 * (lf + rt)

    b1 = hpass(row0, g1, g0)
    b2 = hpass(row0, 0.0, xg1, anti=True)
    b4 = hpass(row0, 0.0, xxg1)  # xxg kernel's center tap is 0
    b3 = hpass(row1, g1, g0)
    b6 = hpass(row1, 0.0, xg1, anti=True)
    b5 = hpass(row2, g1, g0)
    return (
        b3 * ig11,               # b_y
        b2 * ig11,               # b_x
        b5 * ig33 + b1 * ig03,   # A_yy
        b4 * ig33 + b1 * ig03,   # A_xx
        b6 * ig55,               # A_xy
    )


def _kernel(rb, cb, coeffs, a_ref, b_ref, c_ref, d_ref, out_ref):
    c = _moments5(rb, cb, coeffs, _assemble_slab((a_ref, b_ref, c_ref, d_ref)))
    for i in range(5):
        out_ref[0, i] = c[i]


# OpenCV's border down-weighting constants (must match
# optflow/farneback.py::_BORDER_SCALE / ops/pallas_matrices.py).
_BORDER = 5


def _edge_scale(i, size):
    lead = jnp.where(i < _BORDER, jnp.where(i <= 1, 0.14, 0.4472), 1.0)
    ti = size - 1 - i
    trail = jnp.where(ti < _BORDER, jnp.where(ti <= 1, 0.14, 0.4472), 1.0)
    return lead * trail


@functools.partial(
    jax.jit,
    static_argnames=("coeffs", "m_dtype", "r_dtype", "interpret", "col_block"),
)
def pallas_poly_pair_m(
    sp0: jax.Array,
    sp1: jax.Array,
    coeffs: tuple,
    m_dtype=jnp.float32,
    r_dtype=jnp.float32,
    interpret: bool = False,
    col_block: int | None = None,
):
    """Fused polynomial expansion of BOTH images + the zero-flow matrix
    combine: (N, H+2, W+2) pre-smoothed replicate-padded pair ->
    (R0, R1, M0) with R0/R1 (N, 5, H, W) ``r_dtype`` and M0 (N, 5, H, W)
    ``m_dtype``.

    The first Farneback iteration's normal equations sample R1 at zero flow
    (reference compute: FarnebackPolyExp + the first FarnebackUpdateMatrices
    behind cv.calcOpticalFlowFarneback), so R0/R1 are combined into M0 while
    still in VMEM — the separate XLA combine stage re-read both full 5-plane
    stacks from HBM.  The combine always runs in f32 (M0 is computed from the
    pre-rounding values; ``r_dtype`` rounding applies to what later update
    iterations READ — see farneback._r_storage_dtype).
    """
    n, hp2, wp2 = sp0.shape
    h, w = hp2 - 2, wp2 - 2
    rb, cb = _blocks(h, w, _PAIR_ROW_BLOCK, col_block)
    grid = (n, -(-h // rb), -(-w // cb))

    spp0 = _pad_for_views(sp0, h, w, rb, cb)
    spp1 = _pad_for_views(sp1, h, w, rb, cb)
    out_spec = pl.BlockSpec(
        (1, 5, rb, cb), lambda i, r, c: (i, 0, r, c), memory_space=pltpu.VMEM
    )
    hp = -(-h // rb) * rb
    wp = -(-w // cb) * cb
    r0, r1, m0 = pl.pallas_call(
        functools.partial(_pair_kernel, rb, cb, h, w, coeffs),
        out_shape=(
            jax.ShapeDtypeStruct((n, 5, hp, wp), r_dtype),
            jax.ShapeDtypeStruct((n, 5, hp, wp), r_dtype),
            jax.ShapeDtypeStruct((n, 5, hp, wp), m_dtype),
        ),
        grid=grid,
        in_specs=_view_specs(rb, cb) + _view_specs(rb, cb),
        out_specs=(out_spec, out_spec, out_spec),
        compiler_params=compiler_params("parallel", "parallel", "parallel"),
        interpret=interpret,
    )(spp0, spp0, spp0, spp0, spp1, spp1, spp1, spp1)
    return r0[:, :, :h, :w], r1[:, :, :h, :w], m0[:, :, :h, :w]


def _pair_kernel(
    rb, cb, h, w, coeffs,
    a0_ref, b0_ref, c0_ref, d0_ref, a1_ref, b1_ref, c1_ref, d1_ref,
    r0_ref, r1_ref, m_ref,
):
    c0 = _moments5(rb, cb, coeffs, _assemble_slab((a0_ref, b0_ref, c0_ref, d0_ref)))
    c1 = _moments5(rb, cb, coeffs, _assemble_slab((a1_ref, b1_ref, c1_ref, d1_ref)))
    for i in range(5):
        r0_ref[0, i] = c0[i].astype(r0_ref.dtype)
        r1_ref[0, i] = c1[i].astype(r1_ref.dtype)

    # zero-flow combine (mirrors farneback._update_matrices_zero_flow_cf):
    # dx = dy = 0, sampled R1 is R1 itself, inb = stencil inside the image
    row0 = pl.program_id(1) * rb
    col0 = pl.program_id(2) * cb
    iy = row0 + jax.lax.broadcasted_iota(jnp.int32, (rb, cb), 0)
    ix = col0 + jax.lax.broadcasted_iota(jnp.int32, (rb, cb), 1)
    inb = (ix < w - 1) & (iy < h - 1)

    r2 = jnp.where(inb, c1[0], 0.0)
    r3 = jnp.where(inb, c1[1], 0.0)
    r4 = jnp.where(inb, (c0[2] + c1[2]) * 0.5, c0[2])
    r5 = jnp.where(inb, (c0[3] + c1[3]) * 0.5, c0[3])
    r6 = jnp.where(inb, (c0[4] + c1[4]) * 0.25, c0[4] * 0.5)
    r2 = (c0[0] - r2) * 0.5
    r3 = (c0[1] - r3) * 0.5

    scale = _edge_scale(ix, w) * _edge_scale(iy, h)
    r2 = r2 * scale
    r3 = r3 * scale
    r4 = r4 * scale
    r5 = r5 * scale
    r6 = r6 * scale

    m_ref[0] = jnp.stack(
        [
            r4 * r4 + r6 * r6,
            (r4 + r5) * r6,
            r5 * r5 + r6 * r6,
            r4 * r2 + r6 * r3,
            r6 * r2 + r5 * r3,
        ],
        axis=0,
    ).astype(m_ref.dtype)
