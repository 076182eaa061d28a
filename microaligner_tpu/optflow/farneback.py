"""Farneback dense optical flow, reconstructed for XLA/TPU.

A from-scratch implementation of the Farneback algorithm (Farneback 2003,
"Two-frame motion estimation based on polynomial expansion") matching the
numerics of ``cv.calcOpticalFlowFarneback`` as called by the reference
(optflow_reg/flow_calc.py:30-44: ``pyr_scale=0.5, levels=0, winsize,
iterations, poly_n=1, poly_sigma=1.7, OPTFLOW_FARNEBACK_GAUSSIAN``).

Stages (all dense, static-shape, fused by XLA; vmappable over a tile axis):

1. 3x3 pre-smooth of the float image (OpenCV applies this at every pyramid
   level; with levels=0 it is a single [1,2,1]/4 separable blur).
2. Polynomial expansion: each pixel's neighborhood is approximated as
   f(x) ~ c + b.T x + x.T A x via separable Gaussian-weighted correlations;
   channels are [b_y, b_x, A_yy, A_xx, A_xy].
3. Displacement normal equations per pixel from the two expansions, with
   OpenCV's border down-weighting of the outer 5 pixels.
4. Gaussian aggregation over ``winsize`` and a closed-form 2x2 solve,
   iterated ``num_iter`` times (matrices are refreshed from the new flow
   between iterations).

Borders are REPLICATE throughout, as in OpenCV's implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["farneback", "poly_exp"]

# OpenCV down-weights the displacement equations in the outer BORDER pixels
# so the window aggregation doesn't trust poorly-supported border expansions.
_BORDER = 5
_BORDER_SCALE = np.array([0.14, 0.14, 0.4472, 0.4472, 0.4472], dtype=np.float32)


def _replicate_pad_last(x: jax.Array, r: int) -> jax.Array:
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(r, r)], mode="edge")


def _corr1d_lastdim(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Replicate-padded correlation along the last axis, same-size output."""
    k = kernel.shape[0]
    r = (k - 1) // 2
    xp = _replicate_pad_last(x, r)
    lead = xp.shape[:-1]
    xin = xp.reshape((-1, 1, xp.shape[-1]))
    w = kernel.reshape((1, 1, k)).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xin,
        w,  # lax.conv_general_dilated is cross-correlation already (no flip)
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape(lead + (y.shape[-1],))


@functools.lru_cache(maxsize=None)
def _poly_exp_coeffs(n: int, sigma: float):
    """Gaussian applicability kernels + the normal-matrix inverse entries.

    Mirrors OpenCV's FarnebackPolyExp setup: g/xg/xxg over [-n, n] and the
    inverse of G_ij = sum g(y)g(x) b_i(x,y) b_j(x,y), b = [1,x,y,x²,y²,xy].
    """
    x = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(x**2) / (2.0 * sigma * sigma))
    g /= g.sum()
    xg = x * g
    xxg = x * x * g

    xs, ys = np.meshgrid(x, x)  # (2n+1, 2n+1)
    wgt = np.outer(g, g)
    basis = np.stack(
        [np.ones_like(xs), xs, ys, xs * xs, ys * ys, xs * ys], axis=-1
    )  # (K, K, 6)
    G = np.einsum("yx,yxi,yxj->ij", wgt, basis, basis)
    invG = np.linalg.inv(G)
    return (
        g.astype(np.float32),
        xg.astype(np.float32),
        xxg.astype(np.float32),
        float(invG[1, 1]),  # ig11: linear coeff scale
        float(invG[0, 3]),  # ig03: constant <-> quadratic coupling
        float(invG[3, 3]),  # ig33: quadratic diag
        float(invG[5, 5]),  # ig55: cross-term diag
    )


def poly_exp(img: jax.Array, n: int = 1, sigma: float = 1.7) -> jax.Array:
    """Polynomial expansion -> (H, W, 5) channels [b_y, b_x, A_yy, A_xx, A_xy]."""
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_exp_coeffs(n, float(sigma))
    kg = jnp.asarray(g)
    # first-moment kernel: xg is odd, so sum_k xg[k]*(f(x+k)-f(x-k)) over k>0
    # equals the plain correlation with xg over the full [-n, n] support
    kxg = jnp.asarray(xg)
    kxxg = jnp.asarray(xxg)

    f = img.astype(jnp.float32)
    # vertical pass (rows axis): correlate along H by operating on the transpose
    ft = f.T  # (W, H)
    row0 = _corr1d_lastdim(ft, kg).T
    row1 = _corr1d_lastdim(ft, kxg).T
    row2 = _corr1d_lastdim(ft, kxxg).T
    # horizontal pass
    b1 = _corr1d_lastdim(row0, kg)
    b2 = _corr1d_lastdim(row0, kxg)
    b3 = _corr1d_lastdim(row1, kg)
    b4 = _corr1d_lastdim(row0, kxxg)
    b5 = _corr1d_lastdim(row2, kg)
    b6 = _corr1d_lastdim(row1, kxg)

    return jnp.stack(
        [
            b3 * ig11,               # b_y
            b2 * ig11,               # b_x
            b5 * ig33 + b1 * ig03,   # A_yy
            b4 * ig33 + b1 * ig03,   # A_xx
            b6 * ig55,               # A_xy
        ],
        axis=-1,
    )


def _update_matrices(R0: jax.Array, R1: jax.Array, flow: jax.Array) -> jax.Array:
    """Per-pixel displacement normal equations M = [G11, G12, G22, h1, h2]."""
    h, w = flow.shape[:2]
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    dx = flow[..., 0]
    dy = flow[..., 1]
    fx = gx + dx
    fy = gy + dy
    x1 = jnp.floor(fx)
    y1 = jnp.floor(fy)
    tx = fx - x1
    ty = fy - y1
    x1i = x1.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)
    # OpenCV treats a sample as valid only when the whole 2x2 stencil is inside.
    inb = (x1i >= 0) & (x1i < w - 1) & (y1i >= 0) & (y1i < h - 1)
    x1c = jnp.clip(x1i, 0, w - 2)
    y1c = jnp.clip(y1i, 0, h - 2)

    p00 = R1[y1c, x1c]
    p01 = R1[y1c, x1c + 1]
    p10 = R1[y1c + 1, x1c]
    p11 = R1[y1c + 1, x1c + 1]
    a00 = ((1 - tx) * (1 - ty))[..., None]
    a01 = (tx * (1 - ty))[..., None]
    a10 = ((1 - tx) * ty)[..., None]
    a11 = (tx * ty)[..., None]
    samp = p00 * a00 + p01 * a01 + p10 * a10 + p11 * a11  # (H, W, 5)

    inbf = inb[..., None]
    r2 = jnp.where(inb, samp[..., 0], 0.0)
    r3 = jnp.where(inb, samp[..., 1], 0.0)
    r4 = jnp.where(inb, (R0[..., 2] + samp[..., 2]) * 0.5, R0[..., 2])
    r5 = jnp.where(inb, (R0[..., 3] + samp[..., 3]) * 0.5, R0[..., 3])
    r6 = jnp.where(inb, (R0[..., 4] + samp[..., 4]) * 0.25, R0[..., 4] * 0.5)
    del inbf

    r2 = (R0[..., 0] - r2) * 0.5
    r3 = (R0[..., 1] - r3) * 0.5
    r2 = r2 + r4 * dy + r6 * dx
    r3 = r3 + r6 * dy + r5 * dx

    # border down-weighting of the outer 5 px
    bs = jnp.asarray(_BORDER_SCALE)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)

    def edge_scale(i, size):
        lead = jnp.where(i < _BORDER, bs[jnp.clip(i, 0, _BORDER - 1)], 1.0)
        trail = jnp.where(
            i >= size - _BORDER, bs[jnp.clip(size - i - 1, 0, _BORDER - 1)], 1.0
        )
        return lead * trail

    scale = edge_scale(ix, w) * edge_scale(iy, h)
    r2 = r2 * scale
    r3 = r3 * scale
    r4 = r4 * scale
    r5 = r5 * scale
    r6 = r6 * scale

    return jnp.stack(
        [
            r4 * r4 + r6 * r6,   # G11 (y-eq)
            (r4 + r5) * r6,      # G12
            r5 * r5 + r6 * r6,   # G22 (x-eq)
            r4 * r2 + r6 * r3,   # h1
            r6 * r2 + r5 * r3,   # h2
        ],
        axis=-1,
    )


@functools.lru_cache(maxsize=None)
def _agg_kernel(winsize: int) -> np.ndarray:
    """Gaussian aggregation kernel of FarnebackUpdateFlow_GaussianBlur:
    length 2*(winsize//2)+1, sigma = (winsize//2)*0.3, normalized."""
    m = winsize // 2
    i = np.arange(-m, m + 1, dtype=np.float64)
    k = np.exp(-(i**2) / (2.0 * (m * 0.3) ** 2))
    k /= k.sum()
    return k.astype(np.float32)


def _update_flow_gaussian(M: jax.Array, winsize: int) -> jax.Array:
    k = jnp.asarray(_agg_kernel(winsize))
    s = jnp.moveaxis(M, -1, 0)  # (5, H, W)
    s = _corr1d_lastdim(s, k)  # along W
    s = _corr1d_lastdim(jnp.swapaxes(s, -1, -2), k)  # along H
    s = jnp.swapaxes(s, -1, -2)
    g11, g12, g22, h1, h2 = s[0], s[1], s[2], s[3], s[4]
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    flow_x = (g11 * h2 - g12 * h1) * idet
    flow_y = (g22 * h1 - g12 * h2) * idet
    return jnp.stack([flow_x, flow_y], axis=-1)


_PRESMOOTH = np.array([0.25, 0.5, 0.25], dtype=np.float32)


def _pre_smooth(img: jax.Array) -> jax.Array:
    """OpenCV's per-level 3x3 blur (sigma=0 -> fixed [1,2,1]/4 kernel).

    Border is REFLECT_101 (GaussianBlur's default) — unlike the poly-expansion
    and aggregation stages, which replicate.
    """
    from microaligner_tpu.ops.filters import sep_filter2d

    k = jnp.asarray(_PRESMOOTH)
    return sep_filter2d(img.astype(jnp.float32), k, k)


def _farneback_core(
    mov: jax.Array,
    ref: jax.Array,
    win_size: int,
    num_iter: int,
    poly_n: int,
    poly_sigma: float,
) -> jax.Array:
    i0 = _pre_smooth(mov)
    i1 = _pre_smooth(ref)
    r0 = poly_exp(i0, poly_n, poly_sigma)
    r1 = poly_exp(i1, poly_n, poly_sigma)
    flow = jnp.zeros(mov.shape[:2] + (2,), jnp.float32)
    m = _update_matrices(r0, r1, flow)
    for i in range(num_iter):
        flow = _update_flow_gaussian(m, win_size)
        if i < num_iter - 1:
            m = _update_matrices(r0, r1, flow)
    return flow


@functools.partial(
    jax.jit, static_argnames=("win_size", "num_iter", "poly_n", "poly_sigma")
)
def farneback(
    mov_img: jax.Array,
    ref_img: jax.Array,
    win_size: int = 51,
    num_iter: int = 1,
    poly_n: int = 1,
    poly_sigma: float = 1.7,
) -> jax.Array:
    """Dense flow such that ``mov(p) ~ ref(p + flow(p))``.

    Argument order matches the reference's ``farneback(mov_img, ref_img, ...)``
    (flow_calc.py:30-47): ``mov`` plays OpenCV's ``prev``, ``ref`` plays
    ``next``; the Warper then pulls ``mov`` samples from ``p - flow``.
    Single-level (external pyramid), Gaussian window aggregation.
    """
    return _farneback_core(
        jnp.asarray(mov_img),
        jnp.asarray(ref_img),
        int(win_size),
        int(num_iter),
        int(poly_n),
        float(poly_sigma),
    )
