"""Separable filters, image pyramids and min-max normalization.

TPU-native equivalents of the OpenCV kernels enumerated in SURVEY §2.10-bis:
``cv.GaussianBlur`` / ``cv.pyrDown`` / ``cv.pyrUp`` / ``cv.normalize(NORM_MINMAX)``
(reference call sites: feature_registrator.py:287-312, optflow_registrator.py:249-274).

Everything here is shape-static, jit-friendly and runs as fused XLA convolutions.
Border mode is BORDER_REFLECT_101 (numpy/jnp "reflect") which is OpenCV's default
for filters; normalization matches OpenCV's saturate_cast rounding (round half to
even) so u8 goldens agree bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "gaussian_kernel",
    "gaussian_blur",
    "gaussian_blur_mxu",
    "sep_filter2d",
    "dog",
    "pyr_down",
    "pyr_up",
    "minmax_normalize_f32",
    "minmax_normalize_u8",
]


def gaussian_kernel(ksize: int, sigma: float) -> np.ndarray:
    """1-D Gaussian kernel identical to ``cv.getGaussianKernel(ksize, sigma)``.

    For sigma <= 0 OpenCV derives sigma from the kernel size as
    ``0.3*((ksize-1)*0.5 - 1) + 0.8``; it also has hard-coded tables for tiny
    kernels, which coincide with the analytic form for these sizes in float.
    Computed in float64 and cast, matching OpenCV's double-precision build.
    """
    if sigma <= 0:
        # OpenCV substitutes fixed binomial kernels for tiny sizes when sigma<=0.
        fixed = {
            1: [1.0],
            3: [0.25, 0.5, 0.25],
            5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
            7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
        }
        if ksize in fixed:
            return np.asarray(fixed[ksize], dtype=np.float32)
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(x**2) / (2.0 * sigma * sigma))
    k /= k.sum()
    return k.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _blur_operator(size: int, ksize: int, sigma: float) -> np.ndarray:
    """(size, size) matrix B with ``B @ x`` == REFLECT_101-padded Gaussian
    correlation along a length-``size`` axis.

    Lets large-kernel blurs run as dense matmuls on the MXU instead of
    ``ksize`` shifted-slice FMA passes on the VPU — for DAISY's ring sigmas
    (ksize 29..63) that is ~10x less wall time at identical math (the border
    fold is baked into the operator rows).  Computed in float64, cast to f32.
    """
    k = gaussian_kernel(ksize, sigma).astype(np.float64)
    r = (ksize - 1) // 2
    B = np.zeros((size, size), np.float64)
    for t in range(ksize):
        off = t - r
        j = np.arange(size) + off
        # REFLECT_101 fold (gfedcb|abcdefgh|gfedcba), iterated for small sizes
        for _ in range(max(1, (r + size - 1) // max(size - 1, 1) + 1)):
            j = np.where(j < 0, -j, j)
            j = np.where(j >= size, 2 * size - 2 - j, j)
        B[np.arange(size), j] += k[t]
    return B.astype(np.float32)


_BANDED_BLOCK = 512  # output rows per banded-blur block (multiple of 8 lanes)


@functools.lru_cache(maxsize=None)
def _toeplitz_band(block: int, ksize: int, sigma: float) -> np.ndarray:
    """(block, block + ksize - 1) Toeplitz correlation matrix: row i holds the
    kernel at offset i.  One shared operator for EVERY interior block of a
    banded blur — per-pixel MAC cost stays O(block) instead of O(axis size),
    which is what keeps whole-canvas (dense-level) blurs from scaling as n^3.
    """
    k = gaussian_kernel(ksize, sigma).astype(np.float64)
    T = np.zeros((block, block + ksize - 1), np.float64)
    for i in range(block):
        T[i, i : i + ksize] = k
    return T.astype(np.float32)


def _blur_axis_banded(x: jax.Array, axis: int, ksize: int, sigma: float,
                      precision) -> jax.Array:
    """Banded blur-operator matmul along ``axis`` (must be -2 or -1).

    REFLECT_101-pad the axis by r, zero-pad the tail to a block multiple,
    contract every block window with the shared Toeplitz band, concatenate,
    crop.  Identical math to the dense ``_blur_operator`` contraction (the
    reflect fold is the pad; the zero tail only feeds cropped rows).
    """
    size = x.shape[axis]
    r = (ksize - 1) // 2
    block = _BANDED_BLOCK
    nb = -(-size // block)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, r)
    xp = jnp.pad(x, pad, mode="reflect")
    tail = [(0, 0)] * x.ndim
    tail[axis] = (0, nb * block - size)
    xp = jnp.pad(xp, tail, mode="constant")
    T = jnp.asarray(_toeplitz_band(block, ksize, float(sigma)))
    win = block + 2 * r
    eq = "ij,...jw->...iw" if axis in (-2, x.ndim - 2) else "ij,...j->...i"
    outs = [
        jnp.einsum(
            eq, T, jax.lax.slice_in_dim(xp, j * block, j * block + win, axis=axis),
            precision=precision, preferred_element_type=jnp.float32,
        )
        for j in range(nb)
    ]
    out = jnp.concatenate(outs, axis=axis)
    return jax.lax.slice_in_dim(out, 0, size, axis=axis)


def gaussian_blur_mxu(
    x: jax.Array, ksize: int, sigma: float,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Gaussian blur of a (..., H, W) float stack along the last two axes via
    blur-operator matmuls (REFLECT_101 borders, same-size output).

    Same math as ``sep_filter2d`` — ``out = Bh @ x @ Bw^T`` with the border
    fold inside the operators — but contracted on the MXU, which is the right
    unit for kernels too long for the VPU slice-FMA path.  ``precision``
    trades exactness for MXU rate: HIGHEST is full f32 (default);
    DEFAULT rounds inputs to bf16 with f32 accumulation (~0.4% relative,
    ~6x faster) — fine for consumers that only need implementation-consistent
    outputs (e.g. DAISY descriptors).

    Long axes switch to block-banded operators (one shared Toeplitz band over
    ``_BANDED_BLOCK``-row windows): a dense (size, size) operator costs
    O(size) MACs per pixel, which at whole-canvas sizes (the dense feature
    path) both blows up FLOPs and embeds a quadratically-growing constant.
    """
    h, w = x.shape[-2], x.shape[-1]

    def one_axis(arr, axis, size):
        if size > _BANDED_BLOCK + ksize - 1:
            return _blur_axis_banded(arr, axis, ksize, sigma, precision)
        b = jnp.asarray(_blur_operator(size, ksize, float(sigma)))
        eq = ("ij,...jw->...iw") if axis in (-2, arr.ndim - 2) else ("...hj,wj->...hw")
        if axis in (-2, arr.ndim - 2):
            return jnp.einsum(eq, b, arr, precision=precision,
                              preferred_element_type=jnp.float32)
        return jnp.einsum(eq, arr, b, precision=precision,
                          preferred_element_type=jnp.float32)

    y = one_axis(x, -2, h)
    return one_axis(y, -1, w)


def _reflect101_pad_2d(img: jax.Array, pad_h: int, pad_w: int) -> jax.Array:
    """BORDER_REFLECT_101 padding (gfedcb|abcdefgh|gfedcba) == jnp 'reflect'."""
    if pad_h == 0 and pad_w == 0:
        return img
    return jnp.pad(img, ((pad_h, pad_h), (pad_w, pad_w)), mode="reflect")


def _corr1d_axis(x: jax.Array, kernel: jax.Array, axis: int) -> jax.Array:
    """VALID correlation with a 1-D kernel along ``axis`` via shifted-slice FMAs.

    TPU's conv lowering for single-channel 1-D kernels is pathologically slow
    (tiny matmuls / reduce_window); an unrolled shift-add keeps the whole pass
    in one fused full-f32 VPU loop and needs no transposes for the row axis.
    """
    k = kernel.shape[0]
    out_len = x.shape[axis] - k + 1
    acc = None
    for i in range(k):
        sl = jax.lax.slice_in_dim(x, i, i + out_len, axis=axis)
        t = sl * kernel[i]
        acc = t if acc is None else acc + t
    return acc


def _conv1d_lastdim(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """VALID correlation along the last axis, same contract as before."""
    return _corr1d_axis(img, kernel.astype(img.dtype), -1)


def sep_filter2d(img: jax.Array, kx: jax.Array, ky: jax.Array) -> jax.Array:
    """Separable 2-D correlation with REFLECT_101 borders, same-size output.

    Equivalent to ``cv.sepFilter2D`` with the default border.  ``img`` is a 2-D
    float array; ``kx``/``ky`` are odd-length 1-D kernels.
    """
    kx = jnp.asarray(kx, img.dtype)
    ky = jnp.asarray(ky, img.dtype)
    rh = (ky.shape[0] - 1) // 2
    rw = (kx.shape[0] - 1) // 2
    p = _reflect101_pad_2d(img, rh, rw)
    p = _corr1d_axis(p, kx, -1)  # along W
    p = _corr1d_axis(p, ky, -2)  # along H
    return p


def gaussian_blur(img: jax.Array, ksize: int, sigma: float) -> jax.Array:
    """``cv.GaussianBlur(img, (ksize, ksize), sigma)`` on float32 images."""
    k = jnp.asarray(gaussian_kernel(ksize, sigma))
    return sep_filter2d(img, k, k)


@jax.jit
def minmax_normalize_f32(img: jax.Array) -> jax.Array:
    """``cv.normalize(img, None, 0, 1, NORM_MINMAX, CV_32F)``."""
    img = img.astype(jnp.float32)
    lo = jnp.min(img)
    hi = jnp.max(img)
    scale = jnp.where(hi > lo, 1.0 / (hi - lo), 0.0)
    return (img - lo) * scale


@jax.jit
def minmax_normalize_u8(img: jax.Array) -> jax.Array:
    """``cv.normalize(img, None, 0, 255, NORM_MINMAX, CV_8U)``.

    Uses round-half-to-even (OpenCV's cvRound) before the saturate cast.
    """
    img = img.astype(jnp.float32)
    lo = jnp.min(img)
    hi = jnp.max(img)
    scale = jnp.where(hi > lo, 255.0 / (hi - lo), 0.0)
    scaled = (img - lo) * scale
    return jnp.clip(jnp.round(scaled), 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("low_sigma", "high_sigma"))
def _dog_core(img: jax.Array, low_sigma: int, high_sigma: int) -> jax.Array:
    fimg = minmax_normalize_f32(img)
    ksize = low_sigma * 4 * 2 + 1  # reference: feature_registrator.py:301 "as in opencv"
    ls = gaussian_blur(fimg, ksize, low_sigma)
    hs = gaussian_blur(fimg, ksize, high_sigma)
    return minmax_normalize_u8(hs - ls)


@functools.partial(jax.jit, static_argnames=("low_sigma", "high_sigma"))
def _dog_core_u8(img: jax.Array, low_sigma: int, high_sigma: int) -> jax.Array:
    """u8 fast path with the empty-image early-return folded into the graph —
    the reference's host-side ``img.max() == 0`` check (feature_registrator.py
    :295) would cost a 30-70 ms device round trip per call over the tunneled
    backend."""
    return jnp.where(jnp.max(img) == 0, img, _dog_core(img, low_sigma, high_sigma))


def dog_traced(img, use_it: bool = True, low_sigma: int = 5, high_sigma: int = 9):
    """``dog`` usable under an outer jit trace: no host zero-check round trip.

    u8 inputs keep the zero-image early-return on device; other dtypes take
    the processed path unconditionally (an all-zero non-u8 image is a
    degenerate case whose MI gate behaves identically either way).
    """
    if not use_it:
        return img
    if img.dtype == jnp.uint8:
        return _dog_core_u8(img, low_sigma, high_sigma)
    return _dog_core(img, low_sigma, high_sigma)


def dog(img, use_it: bool = True, low_sigma: int = 5, high_sigma: int = 9):
    """Difference-of-Gaussians preprocessing.

    Mirrors the reference ``dog`` (feature_registrator.py:287-312 and
    optflow_registrator.py:249-274): min-max to [0,1] float, blur with a fixed
    ``low_sigma*8+1`` kernel at both sigmas, subtract, min-max to u8.
    Returns the input unchanged when ``use_it`` is False or the image is empty.
    """
    if not use_it:
        return img
    img = jnp.asarray(img)
    if img.dtype == jnp.uint8:
        # same dtype on both branches: keep the zero-image check on device
        return _dog_core_u8(img, low_sigma, high_sigma)
    if int(jax.device_get(jnp.max(img))) == 0:
        return img  # non-u8 passthrough keeps the input dtype (host branch)
    return _dog_core(img, low_sigma, high_sigma)


_PYR_KERNEL = np.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=np.float32) / 16.0


@jax.jit
def pyr_down(img: jax.Array) -> jax.Array:
    """``cv.pyrDown``: 5-tap [1,4,6,4,1]/16 Gaussian + 2x decimation.

    Output size is ((H+1)//2, (W+1)//2); borders are REFLECT_101.
    Matches reference pyramid construction (feature_registrator.py:152,
    optflow_registrator.py:194).
    """
    orig_dtype = img.dtype
    x = img.astype(jnp.float32)
    k = jnp.asarray(_PYR_KERNEL)
    y = sep_filter2d(x, k, k)
    y = y[::2, ::2]
    if jnp.issubdtype(orig_dtype, jnp.integer):
        info = jnp.iinfo(orig_dtype)
        y = jnp.clip(jnp.round(y), info.min, info.max)
    return y.astype(orig_dtype)


@functools.partial(jax.jit, static_argnames=("dstsize",))
def pyr_up(img: jax.Array, dstsize: tuple[int, int]) -> jax.Array:
    """``cv.pyrUp(img, dstsize=(W, H))`` — zero-stuff 2x then blur with 4*kernel.

    ``dstsize`` here is (H, W) (row-major, unlike OpenCV's (W, H) argument).
    Supports the +-1 odd sizes OpenCV allows.  Works on 2-D images and on
    (H, W, C) flow fields (each channel independently), matching the
    reference's flow upscaling (optflow_registrator.py:140-169, 204-215).
    """
    dh, dw = dstsize
    squeeze = img.ndim == 2
    x = img.astype(jnp.float32)
    if squeeze:
        x = x[..., None]
    h, w, c = x.shape
    # Zero-stuffed canvas with a 2-pixel filter margin on each side.  The
    # source is REFLECT_101-padded by 1 before stuffing so that the border
    # taps see reflected samples like OpenCV does.
    # OpenCV's pyrUp border behavior (verified empirically): REFLECT_101 on the
    # leading (top/left) edges; on the trailing edges its separable passes
    # disagree — plain REFLECT vertically (bottom) but REPLICATE horizontally
    # (right).  Only the 2nd out-of-bounds tap distinguishes these, which odd
    # dstsizes expose.
    xp = jnp.pad(x, ((2, 0), (2, 0), (0, 0)), mode="reflect")
    xp = jnp.pad(xp, ((0, 2), (0, 0), (0, 0)), mode="symmetric")
    xp = jnp.pad(xp, ((0, 0), (0, 2), (0, 0)), mode="edge")
    up = jnp.zeros(((h + 4) * 2, (w + 4) * 2, c), dtype=jnp.float32)
    up = up.at[::2, ::2].set(xp)
    k = jnp.asarray(_PYR_KERNEL) * 2.0
    chans = jnp.moveaxis(up, -1, 0)  # (C, H2, W2)
    y = _conv1d_lastdim(chans, k)
    y = _conv1d_lastdim(jnp.swapaxes(y, -1, -2), k)
    y = jnp.swapaxes(y, -1, -2)
    y = jnp.moveaxis(y, 0, -1)
    # With a 2-pixel reflected margin, stuffed source pixel i sits at output
    # index 2i+2 after the VALID conv; crop so dst(2i, 2j) aligns with src(i, j).
    y = y[2 : 2 + dh, 2 : 2 + dw]
    if jnp.issubdtype(img.dtype, jnp.integer):
        info = jnp.iinfo(img.dtype)
        y = jnp.clip(jnp.round(y), info.min, info.max)
    y = y.astype(img.dtype)
    if squeeze:
        y = y[..., 0]
    return y
