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


# Displacement band (pixels) covered by the fast sampling path.  Per-level
# flows after pyramid warping are typically <= 2-3 px; larger flows trigger a
# runtime fallback to the exact gather path, so results are always exact.
_BAND = 4


def _sample_fields(R1: jax.Array, flow: jax.Array):
    h, w = flow.shape[:2]
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    fx = gx + flow[..., 0]
    fy = gy + flow[..., 1]
    x1 = jnp.floor(fx)
    y1 = jnp.floor(fy)
    tx = fx - x1
    ty = fy - y1
    x1i = x1.astype(jnp.int32)
    y1i = y1.astype(jnp.int32)
    # OpenCV treats a sample as valid only when the whole 2x2 stencil is inside.
    inb = (x1i >= 0) & (x1i < w - 1) & (y1i >= 0) & (y1i < h - 1)
    return x1i, y1i, tx, ty, inb


def _bilinear_sample_r_batched(R1: jax.Array, flow: jax.Array):
    """Batched bilinear sample of the 5-channel expansion at p + flow(p).

    ``R1`` is (N, H, W, 5), ``flow`` is (N, H, W, 2).  Rides the shared
    gather-free banded sampler (ops/warp.py) with its exact runtime fallback;
    sampled values at not-in-bounds pixels are discarded by the caller, so
    the zero-outside semantics of that sampler are irrelevant there.
    """
    from microaligner_tpu.ops.warp import sample_displaced_batched

    x1i, y1i, tx, ty, inb = jax.vmap(_sample_fields)(R1, flow)
    samp = sample_displaced_batched(R1, flow, band=_BAND)
    return samp, inb, tx, ty


def _bilinear_sample_r(R1: jax.Array, flow: jax.Array):
    """Single-image wrapper around the batched sampler."""
    samp, inb, tx, ty = _bilinear_sample_r_batched(R1[None], flow[None])
    return samp[0], inb[0], tx[0], ty[0]


def _update_matrices_zero_flow(R0: jax.Array, R1: jax.Array) -> jax.Array:
    """First-call fast path: flow == 0 samples R1 exactly (no gather)."""
    h, w = R0.shape[:2]
    zero_flow = jnp.zeros((h, w, 2), jnp.float32)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    inb = (ix < w - 1) & (iy < h - 1)
    return _combine_matrices(R0, R1, zero_flow[..., 0], zero_flow[..., 1], R1, inb, h, w)


def _update_matrices(R0: jax.Array, R1: jax.Array, flow: jax.Array) -> jax.Array:
    """Per-pixel displacement normal equations M = [G11, G12, G22, h1, h2]."""
    h, w = flow.shape[:2]
    dx = flow[..., 0]
    dy = flow[..., 1]
    samp, inb, _, _ = _bilinear_sample_r(R1, flow)
    return _combine_matrices(R0, R1, dx, dy, samp, inb, h, w)


def _combine_matrices(R0, R1, dx, dy, samp, inb, h, w) -> jax.Array:

    r2 = jnp.where(inb, samp[..., 0], 0.0)
    r3 = jnp.where(inb, samp[..., 1], 0.0)
    r4 = jnp.where(inb, (R0[..., 2] + samp[..., 2]) * 0.5, R0[..., 2])
    r5 = jnp.where(inb, (R0[..., 3] + samp[..., 3]) * 0.5, R0[..., 3])
    r6 = jnp.where(inb, (R0[..., 4] + samp[..., 4]) * 0.25, R0[..., 4] * 0.5)

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


@functools.lru_cache(maxsize=None)
def _banded_smooth_matrix(length: int, winsize: int) -> np.ndarray:
    """(L, L) matrix equivalent of the replicate-padded Gaussian correlation.

    The window aggregation is the FLOP-heavy stage (winsize ~= overlap, e.g.
    99 taps); expressing it as a banded dense matmul moves it from the VPU
    conv path onto the MXU, which is an order of magnitude faster here.
    """
    k = _agg_kernel(winsize).astype(np.float64)
    m = winsize // 2
    B = np.zeros((length, length), np.float64)
    for d in range(-m, m + 1):
        src = np.clip(np.arange(length) + d, 0, length - 1)
        np.add.at(B, (src, np.arange(length)), k[d + m])
    return B.astype(np.float32)


def _smooth5_mxu(s: jax.Array, winsize: int) -> jax.Array:
    """(5, H, W) channel stack -> Gaussian-window smoothed, via two matmuls."""
    h, w = s.shape[-2:]
    bw = jnp.asarray(_banded_smooth_matrix(w, winsize))
    bh = jnp.asarray(_banded_smooth_matrix(h, winsize))
    s = jnp.einsum("chw,wk->chk", s, bw, precision=jax.lax.Precision.HIGHEST)
    s = jnp.einsum("jh,cjw->chw", bh, s, precision=jax.lax.Precision.HIGHEST)
    return s


def _update_flow_gaussian(M: jax.Array, winsize: int) -> jax.Array:
    s = _smooth5_mxu(jnp.moveaxis(M, -1, 0), winsize)
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


def _update_matrices_batched(R0, R1, flow):
    samp, inb, _, _ = _bilinear_sample_r_batched(R1, flow)
    h, w = flow.shape[1:3]
    return jax.vmap(
        lambda r0, r1, f, s, i: _combine_matrices(r0, r1, f[..., 0], f[..., 1], s, i, h, w)
    )(R0, R1, flow, samp, inb)


def _farneback_core_batched(
    movs: jax.Array,
    refs: jax.Array,
    win_size: int,
    num_iter: int,
    poly_n: int,
    poly_sigma: float,
) -> jax.Array:
    """Batched (N, H, W) Farneback — the main entry for tiled flow.

    Keeps the banded/gather branch decision at batch level so vmapping never
    duplicates work.
    """
    pe = jax.vmap(lambda x: poly_exp(_pre_smooth(x), poly_n, poly_sigma))
    r0 = pe(movs)
    r1 = pe(refs)
    m = jax.vmap(_update_matrices_zero_flow)(r0, r1)
    flow = None
    for i in range(num_iter):
        flow = jax.vmap(lambda mm: _update_flow_gaussian(mm, win_size))(m)
        if i < num_iter - 1:
            m = _update_matrices_batched(r0, r1, flow)
    return flow


def _farneback_core(
    mov: jax.Array,
    ref: jax.Array,
    win_size: int,
    num_iter: int,
    poly_n: int,
    poly_sigma: float,
) -> jax.Array:
    return _farneback_core_batched(
        mov[None], ref[None], win_size, num_iter, poly_n, poly_sigma
    )[0]


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
