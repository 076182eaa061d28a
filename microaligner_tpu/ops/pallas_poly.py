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

__all__ = ["pallas_poly_exp5"]

_ROW_BLOCK = 128


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
