"""DAISY dense descriptors (Tola et al., PAMI 2010) as XLA ops.

TPU-native replacement for ``cv.xfeatures2d.DAISY`` with the reference's
parameters (feature_detection.py:96-104): radius=21, q_radius=3 rings,
q_theta=8 points per ring, q_hist=8 orientation bins, no normalization,
bilinear interpolation, no keypoint orientation -> 200-d descriptors
((1 + 3*8) grid points x 8 bins).

Pipeline: slight pre-smoothing -> x/y gradients -> 8 rectified orientation
layers -> incrementally Gaussian-smoothed "cubes" (one sigma per ring) ->
bilinear gathers at the 25 grid points around each keypoint.  Everything is
dense (H, W, 8) tensor math plus one gather, so it vmaps over a tile axis.

Descriptors are implementation-consistent (identical math for ref and mov
images), which is what matching requires; cross-implementation equality with
OpenCV contrib is not required (and not testable here — xfeatures2d is not in
this build).  Transform-level parity is asserted instead (SURVEY §7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from microaligner_tpu.ops.filters import gaussian_blur_mxu, gaussian_kernel

__all__ = ["daisy_at_points", "DAISY_DIM"]

_RADIUS = 21.0
_Q_RADIUS = 3
_Q_THETA = 8
_Q_HIST = 8
DAISY_DIM = (1 + _Q_RADIUS * _Q_THETA) * _Q_HIST  # 200


@functools.lru_cache(maxsize=None)
def _grid_offsets() -> np.ndarray:
    """(25, 2) [dx, dy] grid offsets: center, then rings inside-out."""
    pts = [(0.0, 0.0)]
    for ring in range(_Q_RADIUS):
        r = _RADIUS * (ring + 1) / _Q_RADIUS
        for k in range(_Q_THETA):
            a = 2.0 * np.pi * k / _Q_THETA
            pts.append((r * np.cos(a), r * np.sin(a)))
    return np.asarray(pts, dtype=np.float32)


@functools.lru_cache(maxsize=None)
def _ring_of_point() -> np.ndarray:
    """(25,) cube index per grid point: center uses the innermost cube."""
    return np.asarray([0] + [r for r in range(_Q_RADIUS) for _ in range(_Q_THETA)], np.int32)


@functools.lru_cache(maxsize=None)
def _sigmas() -> np.ndarray:
    """Per-ring smoothing: sigma_i = R*(i+1)/(2*Q) -> 3.5, 7, 10.5."""
    return np.asarray(
        [_RADIUS * (i + 1) / (2 * _Q_RADIUS) for i in range(_Q_RADIUS)], np.float32
    )


def _blur_chw(x: jax.Array, sigma: float) -> jax.Array:
    """Gaussian blur of a (C, H, W) stack along H and W (reflect-101).

    Two regimes: the ring sigmas (ksize 29..63) run as blur-operator matmuls
    on the MXU (``gaussian_blur_mxu`` — ~10x faster than VPU slice-FMA chains
    at these kernel lengths, identical math); short kernels keep the
    shifted-slice FMA path (TPU's conv lowering is pathologically slow for
    single-channel 1-D kernels — same finding as the Farneback polynomial
    expansion).  Channels-FIRST keeps the 8 orientation layers off the
    128-lane axis (channels-last (H, W, 8) pads 8 -> 128 lanes, a 16x memory
    and VPU waste).
    """
    import os

    ksize = int(round(sigma * 4)) * 2 + 1
    if ksize >= 13 and min(x.shape[-2:]) > (ksize - 1) // 2:
        # DEFAULT precision (bf16 inputs, f32 accumulation): descriptors only
        # need implementation consistency between ref and mov, and the smooth
        # ring layers tolerate 0.4% relative rounding; ~6x MXU rate vs f32.
        # MICROALIGNER_TPU_DAISY_EXACT=1 forces full-f32 matmuls (same math
        # as the FMA path) — used by scripts/tpu_parity_check.py --feature to
        # bound the bf16 descriptor perturbation on hardware.  Read at trace
        # time: set it before the first register() call.
        exact = os.environ.get("MICROALIGNER_TPU_DAISY_EXACT", "0") == "1"
        prec = jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT
        return gaussian_blur_mxu(x, ksize, sigma, precision=prec)
    k = gaussian_kernel(ksize, sigma)
    r = (ksize - 1) // 2

    def corr(a, axis):
        size = a.shape[axis]
        pad_width = [(0, 0)] * a.ndim
        pad_width[axis] = (r, r)
        ap = jnp.pad(a, pad_width, mode="reflect")
        out = None
        for i in range(ksize):
            sl = jax.lax.slice_in_dim(ap, i, i + size, axis=axis) * float(k[i])
            out = sl if out is None else out + sl
        return out

    return corr(corr(x, 1), 2)


def _orientation_cubes(img: jax.Array) -> jax.Array:
    """(H, W) image -> (8, Q_RADIUS, H, W) smoothed rectified gradient layers."""
    f = img.astype(jnp.float32)
    # slight pre-smoothing stabilizes the gradients (sigma=0.5, as in DAISY)
    f = _blur_chw(f[None], 0.5)[0]
    fp = jnp.pad(f, 1, mode="reflect")
    gx = (fp[1:-1, 2:] - fp[1:-1, :-2]) * 0.5
    gy = (fp[2:, 1:-1] - fp[:-2, 1:-1]) * 0.5
    thetas = 2.0 * np.pi * np.arange(_Q_HIST) / _Q_HIST
    cos = jnp.asarray(np.cos(thetas), jnp.float32)[:, None, None]
    sin = jnp.asarray(np.sin(thetas), jnp.float32)[:, None, None]
    layers = jnp.maximum(gx[None] * cos + gy[None] * sin, 0.0)  # (8, H, W)

    sig = _sigmas()
    cubes = []
    prev_sigma = 0.0
    cur = layers
    for s in sig:
        inc = float(np.sqrt(s * s - prev_sigma * prev_sigma))
        cur = _blur_chw(cur, inc)
        cubes.append(cur)
        prev_sigma = float(s)
    # orientation-major stack: (8, Q, H, W) reshapes to the (8, Q*H*W) gather
    # operand with NO transpose copy (the fused path's hot layout)
    return jnp.stack(cubes, axis=1)


def _gather_descriptors(cubes: jax.Array, coords: jax.Array) -> jax.Array:
    """Fused multi-point sampling: all 25 grid points x K keypoints in FOUR
    flat takes (one per bilinear tap) over the (8, Q*H*W) cube table.

    The per-grid-point loop this replaces issued 100 small gathers; folding
    the ring index into the flattened spatial address makes the whole
    descriptor table one gather per tap, which XLA lowers to a single big
    dynamic-gather — the profitable shape on TPU.
    """
    _, q, h, w = cubes.shape
    flat = cubes.reshape(_Q_HIST, q * h * w)
    offs = jnp.asarray(_grid_offsets())  # (25, 2)
    base = jnp.asarray(_ring_of_point() * (h * w))[None]  # (1, 25) cube offset
    xs = jnp.clip(coords[:, 0:1] + offs[None, :, 0], 0.0, w - 1.000001)  # (K, 25)
    ys = jnp.clip(coords[:, 1:2] + offs[None, :, 1], 0.0, h - 1.000001)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    tx = (xs - x0)[None]  # (1, K, 25)
    ty = (ys - y0)[None]
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    k, p = xs.shape

    def take(yy, xx):
        return jnp.take(flat, (base + yy * w + xx).reshape(-1), axis=1).reshape(
            _Q_HIST, k, p
        )

    out = (
        take(y0, x0) * (1 - tx) * (1 - ty)
        + take(y0, x1) * tx * (1 - ty)
        + take(y1, x0) * (1 - tx) * ty
        + take(y1, x1) * tx * ty
    )  # (8, K, 25)
    return out.transpose(1, 2, 0).reshape(k, p * _Q_HIST)  # (K, 200)


def daisy_at_points(img: jax.Array, coords: jax.Array, normalize: bool = True) -> jax.Array:
    """Descriptors at ``coords`` (K, 2) [x, y] on image ``img`` -> (K, 200).

    Matches the reference's usage where coords may be offset from the true
    keypoint location (the consistent interior-view offset quirk,
    feature_detection.py:106-108) — sampling happens at exactly the given
    coords.

    ``normalize=True`` (default) L2-normalizes each descriptor.  The reference
    uses NRM_NONE, which makes the Lowe ratio test sensitive to global
    intensity rescaling — DoG's global min-max normalization shifts whenever
    one image has border artifacts (e.g. after a warp), collapsing the match
    count.  Unit-norm descriptors are invariant to that; pass False for
    strict reference-parity behavior.
    """
    desc = _gather_descriptors(_orientation_cubes(img), coords)
    if normalize:
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    return desc
