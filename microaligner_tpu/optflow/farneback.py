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


def _corr_axis_multi(x: jax.Array, kernels, axis: int):
    """Correlate (..., H, W) with several short 1-D kernels along one axis.

    Replicate-padded, same-size output, one shifted-slice FMA pass per tap —
    all kernels share the slice reads, and XLA fuses the whole thing into a
    single VPU loop.  TPU's conv lowering is pathologically slow for
    single-channel 1-D kernels, so this shift-add form is ~5x faster and
    also avoids the transposes the conv formulation needed.
    """
    taps = kernels[0].shape[0]
    r = (taps - 1) // 2
    size = x.shape[axis]
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis if axis >= 0 else x.ndim + axis] = (r, r)
    xp = jnp.pad(x, pad_width, mode="edge")
    outs = [None] * len(kernels)
    for i in range(taps):
        sl = jax.lax.slice_in_dim(xp, i, i + size, axis=axis)
        for j, ker in enumerate(kernels):
            wgt = float(ker[i])
            if wgt == 0.0:
                continue
            t = sl * wgt
            outs[j] = t if outs[j] is None else outs[j] + t
    return [o if o is not None else jnp.zeros_like(x) for o in outs]


def _poly_exp_cf(img: jax.Array, n: int = 1, sigma: float = 1.7) -> jax.Array:
    """Polynomial expansion -> (5, H, W) channels [b_y, b_x, A_yy, A_xx, A_xy].

    Channels-first: a trailing length-5 axis gets padded to the TPU's 128-lane
    tile and the whole hot loop works per-channel anyway.
    """
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_exp_coeffs(n, float(sigma))

    f = img.astype(jnp.float32)
    # vertical pass (rows axis), all three moment kernels in one fused sweep
    row0, row1, row2 = _corr_axis_multi(f, (g, xg, xxg), axis=-2)
    # horizontal pass
    b1, b2, b4 = _corr_axis_multi(row0, (g, xg, xxg), axis=-1)
    b3, b6 = _corr_axis_multi(row1, (g, xg), axis=-1)
    (b5,) = _corr_axis_multi(row2, (g,), axis=-1)

    return jnp.stack(
        [
            b3 * ig11,               # b_y
            b2 * ig11,               # b_x
            b5 * ig33 + b1 * ig03,   # A_yy
            b4 * ig33 + b1 * ig03,   # A_xx
            b6 * ig55,               # A_xy
        ],
        axis=0,
    )


def poly_exp(img: jax.Array, n: int = 1, sigma: float = 1.7) -> jax.Array:
    """Polynomial expansion -> (H, W, 5), the public channels-last view."""
    return jnp.moveaxis(_poly_exp_cf(img, n, sigma), 0, -1)


_PALLAS_POLY_OK: bool | None = None


def _pallas_poly_available() -> bool:
    """Static gate for the fused Mosaic poly-expansion kernel (poly_n=1)."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    global _PALLAS_POLY_OK
    if _PALLAS_POLY_OK is None:
        from microaligner_tpu.utils.selftest import run_outside_trace

        _PALLAS_POLY_OK = run_outside_trace(_pallas_poly_self_test_body)
    return _PALLAS_POLY_OK


def _pallas_poly_self_test_body() -> bool:
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((2, 70, 320)) * 255, jnp.float32)
    got = np.asarray(_poly_exp_batched_pallas(imgs, 1, 1.7))
    want = np.asarray(
        jax.vmap(lambda x: _poly_exp_cf(_pre_smooth(x), 1, 1.7))(imgs)
    )
    return bool(np.allclose(got, want, atol=1e-3))


def _poly_coeff_tuple(n: int, sigma: float):
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_exp_coeffs(n, float(sigma))
    return (
        float(g[0]), float(g[1]), float(xg[2]), float(xxg[2]),
        ig11, ig03, ig33, ig55,
    )


def _poly_exp_batched_pallas(imgs: jax.Array, n: int, sigma: float) -> jax.Array:
    """(N, H, W) -> (N, 5, H, W): XLA pre-smooth + fused Mosaic 3x3 moments."""
    from microaligner_tpu.ops.pallas_poly import pallas_poly_exp5

    s = jax.vmap(_pre_smooth)(imgs)
    sp = jnp.pad(s, ((0, 0), (1, 1), (1, 1)), mode="edge")
    return pallas_poly_exp5(sp, _poly_coeff_tuple(n, sigma))


def _poly_exp_batched(imgs: jax.Array, n: int, sigma: float) -> jax.Array:
    """Batched pre-smooth + polynomial expansion.

    The Mosaic-fused kernel (ops/pallas_poly.py) is correct on v5e
    (self-tested) but measured SLOWER than the XLA shifted-slice form
    (17 ms vs 10 ms per 25x1200² batch — the 3-tap stencils fuse well under
    XLA and the kernel double-fetches its row halo), so XLA stays the
    default; set MICROALIGNER_TPU_PALLAS_POLY=1 to experiment.
    """
    import os

    if (
        n == 1
        and os.environ.get("MICROALIGNER_TPU_PALLAS_POLY") == "1"
        and _pallas_poly_available()
    ):
        return _poly_exp_batched_pallas(imgs, n, sigma)
    return jax.vmap(lambda x: _poly_exp_cf(_pre_smooth(x), n, sigma))(imgs)


_PALLAS_POLYPAIR_OK: bool | None = None


def _pallas_polypair_available() -> bool:
    """Static gate for the fused pair-expansion + zero-flow-combine kernel."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    global _PALLAS_POLYPAIR_OK
    if _PALLAS_POLYPAIR_OK is None:
        from microaligner_tpu.utils.selftest import run_outside_trace

        _PALLAS_POLYPAIR_OK = run_outside_trace(_pallas_polypair_self_test_body)
    return _PALLAS_POLYPAIR_OK


def _poly_pair_m_pallas(
    movs: jax.Array, refs: jax.Array, n: int, sigma: float, win_size: int = 99
):
    """(N, H, W) pair -> (R0, R1, M0): XLA pre-smooth + fused Mosaic kernel.

    ``win_size`` only selects M0's storage dtype (bf16 for production windows,
    f32 below the _BF16_MIN_WINSIZE parity gate)."""
    from microaligner_tpu.ops.pallas_poly import pallas_poly_pair_m

    s0 = jax.vmap(_pre_smooth)(movs)
    s1 = jax.vmap(_pre_smooth)(refs)
    sp0 = jnp.pad(s0, ((0, 0), (1, 1), (1, 1)), mode="edge")
    sp1 = jnp.pad(s1, ((0, 0), (1, 1), (1, 1)), mode="edge")
    return pallas_poly_pair_m(
        sp0, sp1, _poly_coeff_tuple(n, sigma),
        m_dtype=_m_storage_dtype(win_size),
        r_dtype=_r_storage_dtype(win_size),
    )


def _pallas_polypair_self_test_body() -> bool:
    rng = np.random.default_rng(0)
    movs = jnp.asarray(rng.random((2, 70, 320)) * 255, jnp.float32)
    refs = jnp.asarray(rng.random((2, 70, 320)) * 255, jnp.float32)
    r0g, r1g, mg = jax.jit(lambda a, b: _poly_pair_m_pallas(a, b, 1, 1.7))(movs, refs)
    r0w = jax.vmap(lambda x: _poly_exp_cf(_pre_smooth(x), 1, 1.7))(movs)
    r1w = jax.vmap(lambda x: _poly_exp_cf(_pre_smooth(x), 1, 1.7))(refs)
    mw = jax.vmap(_update_matrices_zero_flow_cf)(r0w, r1w)
    # R0/R1 may be stored bf16 (MICROALIGNER_TPU_R_BF16): compare the kernel
    # output against the f32 reference rounded the same way.  Near-identical
    # f32 values can straddle a bf16 grid boundary and round apart by 1 ulp
    # (~0.4% relative), so the bf16 bar is relative, not the f32 atol.
    rdt = _r_storage_dtype()
    r0w = r0w.astype(rdt)
    r1w = r1w.astype(rdt)
    if rdt == jnp.bfloat16:
        r_ok = np.allclose(
            np.asarray(r0g, np.float32), np.asarray(r0w, np.float32),
            rtol=1e-2, atol=0.1,
        ) and np.allclose(
            np.asarray(r1g, np.float32), np.asarray(r1w, np.float32),
            rtol=1e-2, atol=0.1,
        )
    else:
        r_ok = np.allclose(
            np.asarray(r0g), np.asarray(r0w), atol=1e-3
        ) and np.allclose(np.asarray(r1g), np.asarray(r1w), atol=1e-3)
    return bool(
        r_ok
        # M may be stored bf16; both paths round from near-identical f32
        and np.allclose(
            np.asarray(mg, np.float32), np.asarray(mw, np.float32),
            rtol=1e-2, atol=1e-2,
        )
    )


# Displacement band (pixels) covered by the fast sampling path.  Per-level
# flows after pyramid warping are typically <= 2-3 px; larger flows trigger a
# runtime fallback to the exact gather path, so results are always exact.
_BAND = 4


def _edge_scale_map(h: int, w: int) -> jax.Array:
    """Per-pixel border down-weighting of the outer 5 px (OpenCV semantics)."""
    bs = jnp.asarray(_BORDER_SCALE)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)

    def edge_scale(i, size):
        lead = jnp.where(i < _BORDER, bs[jnp.clip(i, 0, _BORDER - 1)], 1.0)
        trail = jnp.where(
            i >= size - _BORDER, bs[jnp.clip(size - i - 1, 0, _BORDER - 1)], 1.0
        )
        return lead * trail

    return edge_scale(ix, w) * edge_scale(iy, h)


def _combine_matrices_cf(R0, dx, dy, samp, inb) -> jax.Array:
    """Normal equations M = [G11, G12, G22, h1, h2], channels-first.

    ``R0``/``samp`` may arrive in the bf16 storage dtype
    (_r_storage_dtype); compute is always f32 — same contract as the Mosaic
    kernel, which converts its loads in VMEM.

    ``R0``/``samp`` are (5, H, W); ``dx``/``dy``/``inb`` are (H, W).
    """
    R0 = R0.astype(jnp.float32)
    samp = samp.astype(jnp.float32)
    h, w = R0.shape[-2:]
    r2 = jnp.where(inb, samp[0], 0.0)
    r3 = jnp.where(inb, samp[1], 0.0)
    r4 = jnp.where(inb, (R0[2] + samp[2]) * 0.5, R0[2])
    r5 = jnp.where(inb, (R0[3] + samp[3]) * 0.5, R0[3])
    r6 = jnp.where(inb, (R0[4] + samp[4]) * 0.25, R0[4] * 0.5)

    r2 = (R0[0] - r2) * 0.5
    r3 = (R0[1] - r3) * 0.5
    r2 = r2 + r4 * dy + r6 * dx
    r3 = r3 + r6 * dy + r5 * dx

    scale = _edge_scale_map(h, w)
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
        axis=0,
    )


def _update_matrices_zero_flow_cf(
    R0: jax.Array, R1: jax.Array, win_size: int = 99
) -> jax.Array:
    """First-iteration fast path: flow == 0 samples R1 exactly (no gather)."""
    h, w = R0.shape[-2:]
    zero = jnp.zeros((h, w), jnp.float32)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    inb = (ix < w - 1) & (iy < h - 1)
    return _combine_matrices_cf(R0, zero, zero, R1, inb).astype(
        _m_storage_dtype(win_size)
    )


_PALLAS_MATRICES_OK: bool | None = None


def _pallas_matrices_available(h: int, band: int, w: int | None = None) -> bool:
    """Static (trace-time) gate for the fused Mosaic matrix-update kernel."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if h < max(16, 2 * band + 1):  # 16: row block must stay 8-sublane aligned
        return False
    del w  # any width: the kernel lane-blocks (scoped VMEM constant in W)
    global _PALLAS_MATRICES_OK
    if _PALLAS_MATRICES_OK is None:
        _PALLAS_MATRICES_OK = _pallas_matrices_self_test()
    return _PALLAS_MATRICES_OK


def _pallas_matrices_self_test() -> bool:
    """Compile-and-compare the Mosaic kernel against the XLA path here.

    Runs on a fresh thread: the gate fires lazily, often inside an outer jit
    trace, and trace state is thread-local (utils/selftest.py).
    """
    from microaligner_tpu.utils.selftest import run_outside_trace

    return run_outside_trace(_pallas_matrices_self_test_body)


def _pallas_matrices_self_test_body() -> bool:
    from microaligner_tpu.ops.pallas_matrices import pallas_update_matrices

    rng = np.random.default_rng(0)
    # exercise the PRODUCTION R storage dtype: both paths convert their loads
    # to f32, so kernel-vs-XLA stays tight even when storage is bf16
    rdt = _r_storage_dtype()
    R0 = jnp.asarray(rng.standard_normal((2, 5, 64, 320)), jnp.float32).astype(rdt)
    R1 = jnp.asarray(rng.standard_normal((2, 5, 64, 320)), jnp.float32).astype(rdt)
    # displacements span most of the production band (_BAND_PALLAS = 7)
    fx = jnp.asarray((rng.random((2, 64, 320)) - 0.5) * 13, jnp.float32)
    fy = jnp.asarray((rng.random((2, 64, 320)) - 0.5) * 13, jnp.float32)
    got = np.asarray(pallas_update_matrices(R0, R1, fx, fy, band=_BAND_PALLAS))
    want = np.asarray(_update_matrices_banded_xla(R0, R1, fx, fy, _BAND_PALLAS))
    return bool(np.allclose(got, want, atol=1e-4))


def _update_matrices_banded_xla(R0, R1, fx, fy, band):
    """XLA banded-sample + combine (CPU path / Mosaic cross-check)."""
    from microaligner_tpu.ops.warp import _sample_banded_one

    h, w = fx.shape[-2:]
    flow = jnp.stack([fx, fy], axis=-1)
    # f32 sampling regardless of the R storage dtype (kernel contract)
    R1_cl = jnp.moveaxis(R1.astype(jnp.float32), 1, -1)
    samp_cl = jax.vmap(lambda im, fl: _sample_banded_one(im, fl, band))(R1_cl, flow)
    samp = jnp.moveaxis(samp_cl, -1, 1)
    inb = _inbounds_map(fx, fy, h, w)
    return jax.vmap(_combine_matrices_cf)(R0, fx, fy, samp, inb)


def _inbounds_map(fx, fy, h, w):
    """OpenCV validity: the whole 2x2 stencil of p + flow(p) is inside."""
    gx = jax.lax.broadcasted_iota(jnp.int32, fx.shape, fx.ndim - 1)
    gy = jax.lax.broadcasted_iota(jnp.int32, fy.shape, fy.ndim - 2)
    ax = gx + jnp.floor(fx).astype(jnp.int32)
    ay = gy + jnp.floor(fy).astype(jnp.int32)
    return (ax >= 0) & (ax < w - 1) & (ay >= 0) & (ay < h - 1)


# Wider band for the Mosaic kernel: its offset loops have DYNAMIC bounds (the
# per-block displacement spread), so covering [-7, 6] instead of [-4, 3] costs
# nothing on typical sub-pixel flows but keeps rare few-pixel excursions (seen
# at mid-iterations near borders) off the whole-batch exact-gather fallback,
# which is ~50x slower.  7 is the widest band whose row block stays at 16
# sublanes — the 24-row geometry a band of 8 needs miscompiles under Mosaic
# (wrong results verified on v5e; 16-row kernels are exact).
_BAND_PALLAS = 7


def _update_matrices_batched_cf(R0, R1, fx, fy, win_size: int = 99):
    """Batched matrix update, (N, 5, H, W) channels-first.

    Picks one of three implementations with ONE lax.cond at batch level:
    the fused Mosaic kernel (TPU), the XLA banded select-FMA path (CPU /
    Mosaic unavailable), or the exact gather fallback when any displacement
    leaves the static band — so results always match cv2's update semantics.
    """
    n, c, h, w = R0.shape
    use_pallas = _pallas_matrices_available(h, _BAND_PALLAS, w)
    band = _BAND_PALLAS if use_pallas else _BAND

    dxi = jnp.floor(fx).astype(jnp.int32)
    dyi = jnp.floor(fy).astype(jnp.int32)
    gx = jax.lax.broadcasted_iota(jnp.int32, dxi.shape, 2)
    gy = jax.lax.broadcasted_iota(jnp.int32, dyi.shape, 1)
    in_band = (
        (dxi >= -band) & (dxi <= band - 1) & (dyi >= -band) & (dyi <= band - 1)
    )
    # pixels whose whole 2x2 stencil is outside take the border branch of the
    # combine in both paths, so they don't need band coverage
    ax = gx + dxi
    ay = gy + dyi
    fully_outside = (ax < -1) | (ax > w - 1) | (ay < -1) | (ay > h - 1)
    ok = jnp.all(in_band | fully_outside)

    m_dt = _m_storage_dtype(win_size)

    def banded(args):
        R0_, R1_, fx_, fy_ = args
        if use_pallas:
            from microaligner_tpu.ops.pallas_matrices import pallas_update_matrices

            return pallas_update_matrices(R0_, R1_, fx_, fy_, band=band, out_dtype=m_dt)
        return _update_matrices_banded_xla(R0_, R1_, fx_, fy_, _BAND).astype(m_dt)

    def exact(args):
        R0_, R1_, fx_, fy_ = args
        from microaligner_tpu.ops.warp import _sample_take_one

        flow = jnp.stack([fx_, fy_], axis=-1)
        samp_cl = jax.vmap(_sample_take_one)(
            jnp.moveaxis(R1_.astype(jnp.float32), 1, -1), flow
        )
        samp = jnp.moveaxis(samp_cl, -1, 1)
        inb = _inbounds_map(fx_, fy_, h, w)
        return jax.vmap(_combine_matrices_cf)(R0_, fx_, fy_, samp, inb).astype(m_dt)

    return jax.lax.cond(ok, banded, exact, (R0, R1, fx, fy))


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
    99 taps); expressing it as a banded matmul moves it from the VPU
    conv path onto the MXU, which is an order of magnitude faster here.
    """
    k = _agg_kernel(winsize).astype(np.float64)
    m = winsize // 2
    B = np.zeros((length, length), np.float64)
    for d in range(-m, m + 1):
        src = np.clip(np.arange(length) + d, 0, length - 1)
        np.add.at(B, (src, np.arange(length)), k[d + m])
    return B.astype(np.float32)


# MXU-native block size for the block-banded aggregation matmuls.
_AGG_BLOCK = 128


@functools.lru_cache(maxsize=None)
def _block_banded_factors(length: int, winsize: int, block: int):
    """Blocked form of the banded smooth operator.

    A dense (L, L) matmul wastes ~(1 - winsize/L) of its FLOPs on the empty
    band.  Chopping the operator into (block, block) tiles keeps only the
    2r+1 block diagonals that intersect the band (r = ceil(halfwin/block)),
    each applied as an MXU-shaped batched matmul.

    Returns (r, nb, factors) with ``factors[d+r]`` an (nb, block, block)
    array such that  y_block[n] = sum_d x_block[n+d] @ factors[d+r][n].
    """
    dense = _banded_smooth_matrix(length, winsize).astype(np.float64)
    m = winsize // 2
    r = -(-m // block)
    nb = -(-length // block)
    lp = nb * block
    D = np.zeros((lp, lp), np.float64)
    D[:length, :length] = dense
    factors = []
    for d in range(-r, r + 1):
        F = np.zeros((nb, block, block), np.float32)
        for n in range(nb):
            i0 = (n + d) * block
            if 0 <= i0 < lp:
                F[n] = D[i0 : i0 + block, n * block : (n + 1) * block]
        factors.append(F)
    return r, nb, factors


# Smallest window for which the single-pass bf16 aggregation stays inside the
# cv2 parity bars.  The bf16 rounding argument (a weighted mean of ~winsize²
# same-sign terms largely cancels input rounding) weakens as the window
# shrinks, and the on-hardware sweep (scripts/tpu_parity_check.py --sweep)
# confirms it: win 11/21 FAIL the bars under bf16 (flow max up to 0.22 px vs
# the 0.05 bar) while win >= 31 passes with >= 3x margin.  Threshold 49 keeps
# a safety level between the smallest validated-pass (31) and the production
# windows (overlap-1, e.g. 99); small windows are cheap, so running them at
# HIGHEST costs little.
_BF16_MIN_WINSIZE = 49


def _agg_precision(winsize: int = _BF16_MIN_WINSIZE):
    """MXU precision for the window aggregation at this ``winsize``.

    DEFAULT (single-pass bf16) is 6x cheaper than HIGHEST and keeps the flow
    comfortably within the cv2 parity bars for production windows: measured
    on real TPU v5e at 2048² win99 iter3, flow mean abs diff 3.2e-4 px (bar
    1e-3), max 0.005 px (bar 0.05), warped MSE 2.9e-10 (bar 1e-3) — see
    scripts/tpu_parity_check.py, incl. the --sweep matrix (the CPU test suite
    runs f32 matmuls and can't exercise the bf16 passes).  Windows below
    _BF16_MIN_WINSIZE run at HIGHEST: the sweep shows bf16 breaks the bars
    there.  Override with MICROALIGNER_TPU_AGG_PRECISION=high|highest (the
    explicit override applies at every winsize).
    """
    import os

    name = os.environ.get("MICROALIGNER_TPU_AGG_PRECISION", "").lower()
    if not name:
        if winsize < _BF16_MIN_WINSIZE:
            return jax.lax.Precision.HIGHEST
        name = "default"
    return {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[name]


@functools.lru_cache(maxsize=None)
def _block_banded_shared(length: int, winsize: int, block: int):
    """Split the blocked operator into a shared interior factor per diagonal
    plus the boundary blocks that differ (replicate-pad accumulation and
    remainder truncation live only in the outer blocks).

    Returns (r, nb, shared, fixups): ``shared[d+r]`` is the (block, block)
    Toeplitz factor applied to every block; ``fixups`` is a list of
    (n, [per-d (block, block) exact factors]) for the blocks where the shared
    product must be recomputed exactly.
    """
    r, nb, factors = _block_banded_factors(length, winsize, block)
    mid = nb // 2
    shared = [F[mid] for F in factors]
    fixups = []
    for n in range(nb):
        if any(not np.array_equal(factors[d][n], shared[d]) for d in range(2 * r + 1)):
            fixups.append((n, [factors[d][n] for d in range(2 * r + 1)]))
    return r, nb, shared, fixups


def _shift_blocks(xb: jax.Array, d: int, axis: int) -> jax.Array:
    """Shift the block axis by d (zero fill), i.e. result block n = x block n+d."""
    if d == 0:
        return xb
    nb = xb.shape[axis]
    pad_shape = list(xb.shape)
    pad_shape[axis] = abs(d)
    zeros = jnp.zeros(pad_shape, xb.dtype)
    if d > 0:
        body = jax.lax.slice_in_dim(xb, d, nb, axis=axis)
        return jnp.concatenate([body, zeros], axis=axis)
    body = jax.lax.slice_in_dim(xb, 0, nb + d, axis=axis)
    return jnp.concatenate([zeros, body], axis=axis)


def _block_smooth_axis(x: jax.Array, winsize: int, axis: int, block: int = _AGG_BLOCK) -> jax.Array:
    """Smooth along ``axis`` (-1 or -2) via block-banded MXU matmuls (exact).

    The band occupies only ~winsize/L of a dense (L, L) operator; applying the
    2r+1 non-empty block diagonals as plain unbatched matmuls (shared interior
    factor, exact overwrite of the few boundary blocks) cuts the FLOPs ~3x
    AND avoids both the batched-einsum transposes and any swapaxes copies —
    the -2 axis is handled by multiplying from the left.
    """
    assert axis in (-1, -2)
    length = x.shape[axis]
    r, nb, shared, fixups = _block_banded_shared(length, winsize, block)
    prec = _agg_precision(winsize)
    if nb < 2 * r + 3 or len(fixups) >= nb:
        # no interior majority: small axis, just use the dense banded matrix
        D = jnp.asarray(_banded_smooth_matrix(length, winsize))
        if axis == -1:
            return jnp.einsum("...w,wk->...k", x, D, precision=prec)
        return jnp.einsum("jh,...jw->...hw", D, x, precision=prec)

    lp = nb * block
    if lp != length:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, lp - length)
        x = jnp.pad(x, pad)
    # split the target axis into (nb, block)
    new_shape = x.shape[: x.ndim + axis] + (nb, block) + x.shape[x.ndim + axis + 1 :]
    xb = x.reshape(new_shape)
    blk_axis = axis - 1  # block index sits just before the intra-block axis

    y = None
    for d in range(-r, r + 1):
        F = jnp.asarray(shared[d + r])
        xs = _shift_blocks(xb, d, blk_axis)
        if axis == -1:
            t = jnp.einsum("...i,io->...o", xs, F, precision=prec)
        else:
            t = jnp.einsum("jo,...jw->...ow", F, xs, precision=prec)
        y = t if y is None else y + t

    # overwrite the boundary blocks with their exact per-block products
    for n, Fs in fixups:
        tn = None
        for d in range(-r, r + 1):
            src = n + d
            if src < 0 or src >= nb:
                continue
            F = jnp.asarray(Fs[d + r])
            if axis == -1:
                xsrc = xb[..., src, :]
                td = jnp.einsum("...i,io->...o", xsrc, F, precision=prec)
            else:
                xsrc = jax.lax.index_in_dim(xb, src, axis=blk_axis, keepdims=False)
                td = jnp.einsum("jo,...jw->...ow", F, xsrc, precision=prec)
            tn = td if tn is None else tn + td
        if axis == -1:
            y = y.at[..., n, :].set(tn)
        else:
            idx = [slice(None)] * y.ndim
            idx[blk_axis] = n
            y = y.at[tuple(idx)].set(tn)

    flat_shape = y.shape[: y.ndim + blk_axis] + (lp,) + y.shape[y.ndim + axis :][1:]
    y = y.reshape(flat_shape)
    if lp != length:
        y = jax.lax.slice_in_dim(y, 0, length, axis=axis)
    return y


def _smooth5_mxu(s: jax.Array, winsize: int) -> jax.Array:
    """(..., 5, H, W) channel stack -> Gaussian-window smoothed, via
    block-banded MXU matmuls along each axis (no transposes)."""
    s = _block_smooth_axis(s, winsize, -1)
    s = _block_smooth_axis(s, winsize, -2)
    return s


def _m_storage_dtype(winsize: int = _BF16_MIN_WINSIZE):
    """Storage dtype for the normal-equation planes M between the matrix
    stage and the window aggregation.

    bf16 halves the aggregation chain's HBM traffic (M is written once and
    read twice per iteration).  It is numerically near-free because under
    DEFAULT precision the aggregation matmuls already round their INPUTS to
    bf16 on the MXU — storing M in bf16 applies the same rounding one stage
    earlier.  Validated on-hardware against the cv2 parity bars
    (scripts/tpu_parity_check.py).  f32 when the aggregation precision is
    raised — by MICROALIGNER_TPU_AGG_PRECISION or by the small-window gate
    (winsize < _BF16_MIN_WINSIZE) — or off-TPU (CPU tests are f32).
    """
    if _agg_precision(winsize) != jax.lax.Precision.DEFAULT:
        return jnp.float32
    if jax.default_backend() not in ("tpu", "axon"):
        return jnp.float32
    return jnp.bfloat16


def _r_storage_dtype(winsize: int = _BF16_MIN_WINSIZE):
    """Storage dtype for the polynomial-expansion planes R0/R1 between the
    expansion and the per-iteration matrix updates.

    bf16 halves the matrix-update stage's dominant HBM traffic (R0 is read
    once and R1 effectively twice per update — the Mosaic kernel fetches two
    overlapping row-block views); all compute stays f32 (kernel converts its
    loads in VMEM, _combine_matrices_cf casts at entry).  The rounding
    argument matches M storage: the update's products already round through
    bf16 on DEFAULT-precision MXU stages downstream.

    DEFAULT ON, gated exactly like ``_m_storage_dtype`` (f32 off-TPU and
    whenever the aggregation precision is raised — including the small-window
    parity gate).  Validated 2026-08-18 on v5e: the full parity sweep
    (``MICROALIGNER_TPU_R_BF16=1 scripts/tpu_parity_check.py --sweep``)
    passed every size/winsize combination (worst flow mean abs diff vs cv2
    5.4e-4 px, warped MSE <= 4.2e-9), and the bench A/B measured it faster
    on both dense configs (config 2: 80.2 -> 78.5 ms; config 5 register:
    1.75 -> 1.55 s).  ``MICROALIGNER_TPU_R_BF16=0`` (trace-time) forces f32
    for exactness experiments.
    """
    import os

    if os.environ.get("MICROALIGNER_TPU_R_BF16", "1") == "0":
        return jnp.float32
    if _agg_precision(winsize) != jax.lax.Precision.DEFAULT:
        return jnp.float32
    if jax.default_backend() not in ("tpu", "axon"):
        return jnp.float32
    return jnp.bfloat16


_PALLAS_AGG_OK: bool | None = None


def _pallas_agg_available(winsize: int) -> bool:
    """Static gate for the Mosaic banded-aggregation kernels."""
    if winsize // 2 > 128 or jax.default_backend() not in ("tpu", "axon"):
        return False
    global _PALLAS_AGG_OK
    if _PALLAS_AGG_OK is None:
        _PALLAS_AGG_OK = _pallas_agg_self_test()
    return _PALLAS_AGG_OK


def _pallas_agg_self_test() -> bool:
    """Compile-and-compare on well-conditioned (real-pipeline) matrices.

    Runs on a fresh thread: the gate fires lazily, often inside an outer jit
    trace, and trace state is thread-local (utils/selftest.py).
    """
    from microaligner_tpu.utils.selftest import run_outside_trace

    return run_outside_trace(_pallas_agg_self_test_body)


def _pallas_agg_self_test_body() -> bool:
    """Checks BOTH production precision classes against the XLA reference:

    * winsize >= _BF16_MIN_WINSIZE -> DEFAULT precision, bf16 M storage
    * winsize <  _BF16_MIN_WINSIZE -> HIGHEST precision, f32 M storage

    The M dtype must come from ``_m_storage_dtype(winsize)`` for the SAME
    winsize being solved: a mixed combo (bf16 M + HIGHEST solve) makes the
    kernel cast its factors to bf16 while the XLA path keeps f32 factors —
    a spurious mismatch no production path can produce (it silently demoted
    the kernel for a whole process when the small-window gate landed).
    """
    from microaligner_tpu.ops.pallas_agg import pallas_smooth5_solve

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((70, 100)) * 255, jnp.float32)
    mov = jnp.roll(img, 2, axis=1)
    r0 = _poly_exp_cf(_pre_smooth(mov), 1, 1.7)
    r1 = _poly_exp_cf(_pre_smooth(img), 1, 1.7)
    for winsize in (31, _BF16_MIN_WINSIZE + 2):
        M = _update_matrices_zero_flow_cf(r0, r1, winsize)[None]
        fx, fy = jax.jit(lambda m, w=winsize: pallas_smooth5_solve(m, w))(M)
        rx, ry = _update_flow_gaussian_xla(M, winsize)
        if not (
            np.allclose(np.asarray(fx), np.asarray(rx), atol=1e-4)
            and np.allclose(np.asarray(fy), np.asarray(ry), atol=1e-4)
        ):
            return False
    return True


def _update_flow_gaussian_xla(M: jax.Array, winsize: int):
    """XLA aggregation + solve (CPU path / Mosaic cross-check)."""
    s = _smooth5_mxu(M, winsize)
    g11, g12, g22, h1, h2 = (s[..., i, :, :] for i in range(5))
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    flow_x = (g11 * h2 - g12 * h1) * idet
    flow_y = (g22 * h1 - g12 * h2) * idet
    return flow_x, flow_y


def _update_flow_gaussian_cf(M: jax.Array, winsize: int):
    """(..., 5, H, W) normal equations -> (flow_x, flow_y), each (..., H, W).

    Flow channels stay separate arrays: stacking them adds a trailing dim of 2
    that XLA pads to a full (8, 128) tile — a 64x memory blowup at 20k scale.
    Uses the fused Mosaic aggregation+solve kernels on TPU (one HBM pass per
    stage); falls back to block-banded MXU matmuls elsewhere.
    """
    if M.ndim == 4 and _pallas_agg_available(winsize):
        from microaligner_tpu.ops.pallas_agg import pallas_smooth5_solve

        return pallas_smooth5_solve(M, winsize)
    return _update_flow_gaussian_xla(M, winsize)


_PRESMOOTH = np.array([0.25, 0.5, 0.25], dtype=np.float32)


def _pre_smooth(img: jax.Array) -> jax.Array:
    """OpenCV's per-level 3x3 blur (sigma=0 -> fixed [1,2,1]/4 kernel).

    Border is REFLECT_101 (GaussianBlur's default) — unlike the poly-expansion
    and aggregation stages, which replicate.
    """
    from microaligner_tpu.ops.filters import sep_filter2d

    k = jnp.asarray(_PRESMOOTH)
    return sep_filter2d(img.astype(jnp.float32), k, k)


def _farneback_core_parts(
    movs: jax.Array,
    refs: jax.Array,
    win_size: int,
    num_iter: int,
    poly_n: int,
    poly_sigma: float,
):
    """Batched (N, H, W) Farneback -> (fx, fy), each (N, H, W).

    Flow channels stay SEPARATE arrays throughout (a trailing stacked dim of
    2 invites padded T(8,128) layouts and relayout copies); callers that need
    the (N, H, W, 2) API stack at the very end.  Keeps the banded/gather
    branch decision at batch level so vmapping never duplicates work.
    """
    if num_iter < 1:
        raise ValueError(f"farneback requires num_iter >= 1, got {num_iter}")
    if poly_n == 1 and _pallas_polypair_available():
        # fused Mosaic kernel: both expansions + the first-iteration combine
        # in one HBM pass (the separate combine re-read both 5-plane stacks)
        r0, r1, m = _poly_pair_m_pallas(movs, refs, poly_n, poly_sigma, win_size)
    else:
        rdt = _r_storage_dtype(win_size)
        r0 = _poly_exp_batched(movs, poly_n, poly_sigma).astype(rdt)
        r1 = _poly_exp_batched(refs, poly_n, poly_sigma).astype(rdt)
        m = jax.vmap(
            lambda a, b: _update_matrices_zero_flow_cf(a, b, win_size)
        )(r0, r1)
    fx = fy = None
    for i in range(num_iter):
        fx, fy = _update_flow_gaussian_cf(m, win_size)
        if i < num_iter - 1:
            m = _update_matrices_batched_cf(r0, r1, fx, fy, win_size)
    return fx, fy


def _farneback_core_batched(
    movs: jax.Array,
    refs: jax.Array,
    win_size: int,
    num_iter: int,
    poly_n: int,
    poly_sigma: float,
) -> jax.Array:
    """Batched (N, H, W) Farneback -> (N, H, W, 2) stacked flow."""
    fx, fy = _farneback_core_parts(movs, refs, win_size, num_iter, poly_n, poly_sigma)
    return jnp.stack([fx, fy], axis=-1)


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
