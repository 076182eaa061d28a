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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_poly_exp5", "pallas_poly_pair_m"]

_ROW_BLOCK = 128
_PAIR_ROW_BLOCK = 32  # pair kernel holds 3 output stacks in VMEM -> smaller rb


@functools.partial(jax.jit, static_argnames=("coeffs", "interpret"))
def pallas_poly_exp5(sp: jax.Array, coeffs: tuple, interpret: bool = False) -> jax.Array:
    """(N, H+2, W+2) replicate-padded pre-smoothed image -> (N, 5, H, W).

    ``coeffs`` is the static tuple (g0, g1, xg1, xxg1, ig11, ig03, ig33,
    ig55) from the Gaussian applicability (farneback._poly_exp_coeffs).
    """
    n, hp2, wp2 = sp.shape
    h, w = hp2 - 2, wp2 - 2
    # block rows must be a multiple of 8 sublanes (Pallas TPU requirement)
    rb = min(_ROW_BLOCK, -(-h // 8) * 8)
    hpad = (-h) % rb
    if hpad:
        sp = jnp.pad(sp, ((0, 0), (0, hpad), (0, 0)), mode="edge")
    hp = h + hpad
    grid = (n, hp // rb)

    # two consecutive (rb+?)-row views cover the rb+2 rows each block needs
    in_a = pl.BlockSpec((1, rb, wp2), lambda i, r: (i, r, 0), memory_space=pltpu.VMEM)
    in_b = pl.BlockSpec((1, rb, wp2), lambda i, r: (i, r + 1, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, 5, rb, w), lambda i, r: (i, 0, r, 0), memory_space=pltpu.VMEM
    )
    # bottom slack so view (r+1) exists for the last block
    spp = jnp.pad(sp, ((0, 0), (0, rb), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, rb, w, coeffs),
        out_shape=jax.ShapeDtypeStruct((n, 5, hp, w), jnp.float32),
        grid=grid,
        in_specs=[in_a, in_b],
        out_specs=out_spec,
        interpret=interpret,
    )(spp, spp)
    return out[:, :, :h, :]


def _moments5(rb, w, coeffs, a_ref, b_ref):
    """Shared 3x3 moment math: two consecutive row-block views -> the five
    expansion channels [b_y, b_x, A_yy, A_xx, A_xy], each (rb, w)."""
    g0, g1, xg1, xxg1, ig11, ig03, ig33, ig55 = coeffs
    slab = jnp.concatenate([a_ref[0], b_ref[0]], axis=0)  # (2rb, w+2)

    up = jax.lax.slice_in_dim(slab, 0, rb, axis=0)
    mid = jax.lax.slice_in_dim(slab, 1, rb + 1, axis=0)
    dn = jax.lax.slice_in_dim(slab, 2, rb + 2, axis=0)
    row0 = g1 * mid + g0 * (up + dn)
    row1 = xg1 * (dn - up)
    row2 = xxg1 * (up + dn)

    def hpass(r, k0, k1, anti=False):
        lf = jax.lax.slice_in_dim(r, 0, w, axis=1)
        md = jax.lax.slice_in_dim(r, 1, w + 1, axis=1)
        rt = jax.lax.slice_in_dim(r, 2, w + 2, axis=1)
        if anti:
            return k1 * (rt - lf)
        return k0 * md + k1 * (lf + rt)

    b1 = hpass(row0, g1, g0)
    b2 = hpass(row0, 0.0, xg1, anti=True)
    b4 = hpass(row0, 0.0, xxg1)
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


def _kernel(rb, w, coeffs, a_ref, b_ref, out_ref):
    g0, g1, xg1, xxg1, ig11, ig03, ig33, ig55 = coeffs
    slab = jnp.concatenate([a_ref[0], b_ref[0]], axis=0)  # (2rb, w+2)

    # vertical 3-tap moment passes over rows [r-1, r+rb+1) of the padded img:
    # row i of the outputs corresponds to padded row i+1
    up = jax.lax.slice_in_dim(slab, 0, rb, axis=0)
    mid = jax.lax.slice_in_dim(slab, 1, rb + 1, axis=0)
    dn = jax.lax.slice_in_dim(slab, 2, rb + 2, axis=0)
    row0 = g1 * mid + g0 * (up + dn)          # g  (symmetric)
    row1 = xg1 * (dn - up)                     # xg (antisymmetric: [-xg1,0,xg1])
    row2 = xxg1 * (up + dn)                    # xxg ([xxg1,0,xxg1])

    def hpass(r, k0, k1, anti=False):
        lf = jax.lax.slice_in_dim(r, 0, w, axis=1)
        md = jax.lax.slice_in_dim(r, 1, w + 1, axis=1)
        rt = jax.lax.slice_in_dim(r, 2, w + 2, axis=1)
        if anti:
            return k1 * (rt - lf)
        return k0 * md + k1 * (lf + rt)

    b1 = hpass(row0, g1, g0)
    b2 = hpass(row0, 0.0, xg1, anti=True)
    b4 = hpass(row0, 0.0, xxg1)  # xxg kernel's center tap is 0
    b3 = hpass(row1, g1, g0)
    b6 = hpass(row1, 0.0, xg1, anti=True)
    b5 = hpass(row2, g1, g0)

    out_ref[0, 0] = b3 * ig11               # b_y
    out_ref[0, 1] = b2 * ig11               # b_x
    out_ref[0, 2] = b5 * ig33 + b1 * ig03   # A_yy
    out_ref[0, 3] = b4 * ig33 + b1 * ig03   # A_xx
    out_ref[0, 4] = b6 * ig55               # A_xy


# OpenCV's border down-weighting constants (must match
# optflow/farneback.py::_BORDER_SCALE / ops/pallas_matrices.py).
_BORDER = 5


def _edge_scale(i, size):
    lead = jnp.where(i < _BORDER, jnp.where(i <= 1, 0.14, 0.4472), 1.0)
    ti = size - 1 - i
    trail = jnp.where(ti < _BORDER, jnp.where(ti <= 1, 0.14, 0.4472), 1.0)
    return lead * trail


@functools.partial(
    jax.jit, static_argnames=("coeffs", "m_dtype", "r_dtype", "interpret")
)
def pallas_poly_pair_m(
    sp0: jax.Array,
    sp1: jax.Array,
    coeffs: tuple,
    m_dtype=jnp.float32,
    r_dtype=jnp.float32,
    interpret: bool = False,
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
    rb = min(_PAIR_ROW_BLOCK, -(-h // 8) * 8)
    hpad = (-h) % rb
    if hpad:
        pad = ((0, 0), (0, hpad), (0, 0))
        sp0 = jnp.pad(sp0, pad, mode="edge")
        sp1 = jnp.pad(sp1, pad, mode="edge")
    hp = h + hpad
    grid = (n, hp // rb)

    in_a = pl.BlockSpec((1, rb, wp2), lambda i, r: (i, r, 0), memory_space=pltpu.VMEM)
    in_b = pl.BlockSpec((1, rb, wp2), lambda i, r: (i, r + 1, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, 5, rb, w), lambda i, r: (i, 0, r, 0), memory_space=pltpu.VMEM
    )
    spp0 = jnp.pad(sp0, ((0, 0), (0, rb), (0, 0)))
    spp1 = jnp.pad(sp1, ((0, 0), (0, rb), (0, 0)))
    r0, r1, m0 = pl.pallas_call(
        functools.partial(_pair_kernel, rb, h, w, coeffs),
        out_shape=(
            jax.ShapeDtypeStruct((n, 5, hp, w), r_dtype),
            jax.ShapeDtypeStruct((n, 5, hp, w), r_dtype),
            jax.ShapeDtypeStruct((n, 5, hp, w), m_dtype),
        ),
        grid=grid,
        in_specs=[in_a, in_b, in_a, in_b],
        out_specs=(out_spec, out_spec, out_spec),
        interpret=interpret,
    )(spp0, spp0, spp1, spp1)
    return r0[:, :, :h, :], r1[:, :, :h, :], m0[:, :, :h, :]


def _pair_kernel(rb, h, w, coeffs, a0_ref, b0_ref, a1_ref, b1_ref, r0_ref, r1_ref, m_ref):
    c0 = _moments5(rb, w, coeffs, a0_ref, b0_ref)  # mov expansion -> R0
    c1 = _moments5(rb, w, coeffs, a1_ref, b1_ref)  # ref expansion -> R1
    for i in range(5):
        r0_ref[0, i] = c0[i].astype(r0_ref.dtype)
        r1_ref[0, i] = c1[i].astype(r1_ref.dtype)

    # zero-flow combine (mirrors farneback._update_matrices_zero_flow_cf):
    # dx = dy = 0, sampled R1 is R1 itself, inb = stencil inside the image
    row0 = pl.program_id(1) * rb
    iy = row0 + jax.lax.broadcasted_iota(jnp.int32, (rb, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (rb, w), 1)
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
