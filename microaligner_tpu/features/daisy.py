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

from microaligner_tpu.ops.filters import gaussian_kernel

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


def _blur_hw8(x: jax.Array, sigma: float) -> jax.Array:
    """Gaussian blur of an (H, W, C) stack along H and W (reflect-101)."""
    ksize = int(round(sigma * 4)) * 2 + 1
    k = jnp.asarray(gaussian_kernel(ksize, sigma))
    r = (ksize - 1) // 2
    xp = jnp.pad(x, ((r, r), (r, r), (0, 0)), mode="reflect")
    chans = jnp.moveaxis(xp, -1, 0)  # (C, H', W')
    lead = chans.shape[:-1]
    flat = chans.reshape(-1, 1, chans.shape[-1])
    w = k.reshape(1, 1, ksize).astype(x.dtype)
    conv = lambda a: jax.lax.conv_general_dilated(
        a, w, (1,), "VALID", dimension_numbers=("NCW", "OIW", "NCW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    y = conv(flat).reshape(lead + (-1,))
    y = jnp.swapaxes(y, -1, -2)
    y = conv(y.reshape(-1, 1, y.shape[-1])).reshape(y.shape[:-1] + (-1,))
    y = jnp.swapaxes(y, -1, -2)
    return jnp.moveaxis(y, 0, -1)


def _orientation_cubes(img: jax.Array) -> jax.Array:
    """(H, W) image -> (Q_RADIUS, H, W, 8) smoothed rectified gradient layers."""
    f = img.astype(jnp.float32)
    # slight pre-smoothing stabilizes the gradients (sigma=0.5, as in DAISY)
    f = _blur_hw8(f[..., None], 0.5)[..., 0]
    fp = jnp.pad(f, 1, mode="reflect")
    gx = (fp[1:-1, 2:] - fp[1:-1, :-2]) * 0.5
    gy = (fp[2:, 1:-1] - fp[:-2, 1:-1]) * 0.5
    thetas = 2.0 * np.pi * np.arange(_Q_HIST) / _Q_HIST
    cos = jnp.asarray(np.cos(thetas), jnp.float32)
    sin = jnp.asarray(np.sin(thetas), jnp.float32)
    layers = jnp.maximum(gx[..., None] * cos + gy[..., None] * sin, 0.0)  # (H, W, 8)

    sig = _sigmas()
    cubes = []
    prev_sigma = 0.0
    cur = layers
    for s in sig:
        inc = float(np.sqrt(s * s - prev_sigma * prev_sigma))
        cur = _blur_hw8(cur, inc)
        cubes.append(cur)
        prev_sigma = float(s)
    return jnp.stack(cubes)  # (Q, H, W, 8)


def _bilinear_gather(cube: jax.Array, xs: jax.Array, ys: jax.Array) -> jax.Array:
    """Sample (H, W, 8) at float coords (clamped/replicate) -> (..., 8)."""
    h, w, _ = cube.shape
    xs = jnp.clip(xs, 0.0, w - 1.000001)
    ys = jnp.clip(ys, 0.0, h - 1.000001)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    tx = (xs - x0)[..., None]
    ty = (ys - y0)[..., None]
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    v00 = cube[y0, x0]
    v01 = cube[y0, x1]
    v10 = cube[y1, x0]
    v11 = cube[y1, x1]
    return (
        v00 * (1 - tx) * (1 - ty)
        + v01 * tx * (1 - ty)
        + v10 * (1 - tx) * ty
        + v11 * tx * ty
    )


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
    cubes = _orientation_cubes(img)  # (Q, H, W, 8)
    offs = jnp.asarray(_grid_offsets())  # (25, 2)
    ring = _ring_of_point()  # (25,)
    xs = coords[:, 0:1] + offs[None, :, 0]  # (K, 25)
    ys = coords[:, 1:2] + offs[None, :, 1]

    parts = []
    for p in range(offs.shape[0]):
        c = cubes[int(ring[p])]
        parts.append(_bilinear_gather(c, xs[:, p], ys[:, p]))  # (K, 8)
    desc = jnp.concatenate(parts, axis=-1)  # (K, 200)
    if normalize:
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    return desc
