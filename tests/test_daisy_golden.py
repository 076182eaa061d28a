"""DAISY cross-implementation golden: pure-NumPy transcription of the DAISY
math (Tola et al., PAMI 2010; parameterization of cv.xfeatures2d.DAISY as used
by the reference at feature_detection.py:96-104 — radius=21, q_radius=3,
q_theta=8, q_hist=8, interpolation=True, use_orientation=False -> 200-d).

The golden below shares NO code with microaligner_tpu.features.daisy: kernels
are built by direct evaluation, convolutions run as explicit padded dot
products, and the 25-point grid / per-ring sigmas / bilinear taps are derived
independently from the paper's formulas.  If the package's grid geometry,
sigma schedule, gradient convention, or tap math drifts, these tests fail.

cv2-contrib (the reference's actual DAISY) is not installable here; this
golden is the substitute demanded by the round-3 review (VERDICT item 4).
"""

import os

import numpy as np
import pytest

# Exact f32 matmuls in the package path so the comparison tolerance is tight.
os.environ["MICROALIGNER_TPU_DAISY_EXACT"] = "1"

import jax.numpy as jnp

from microaligner_tpu.features.daisy import DAISY_DIM, daisy_at_points

RADIUS = 21.0
Q_RADIUS = 3
Q_THETA = 8
Q_HIST = 8


# --------------------------------------------------------------- the golden


def _np_gauss_kernel(sigma):
    """Truncated normalized Gaussian, ksize = round(4*sigma)*2 + 1 (the
    OpenCV getGaussianKernel convention the package mirrors)."""
    ksize = int(round(sigma * 4)) * 2 + 1
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()), (ksize - 1) // 2


def _np_blur(img, sigma):
    """Separable Gaussian correlation with REFLECT_101 borders, via explicit
    padded sliding dot products (no scipy, no shared code with the package)."""
    k, r = _np_gauss_kernel(sigma)
    out = img.astype(np.float64)
    for axis in (0, 1):
        moved = np.moveaxis(out, axis, -1)
        padded = np.pad(moved, [(0, 0)] * (moved.ndim - 1) + [(r, r)], mode="reflect")
        windows = np.lib.stride_tricks.sliding_window_view(padded, len(k), axis=-1)
        out = np.moveaxis(windows @ k, -1, axis)
    return out


def _np_bilinear(layer, x, y):
    """Clamped bilinear sample of a 2-D array at float coords."""
    h, w = layer.shape
    x = np.clip(x, 0.0, w - 1.000001)
    y = np.clip(y, 0.0, h - 1.000001)
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    x1, y1 = min(x0 + 1, w - 1), min(y0 + 1, h - 1)
    tx, ty = x - x0, y - y0
    return (
        layer[y0, x0] * (1 - tx) * (1 - ty)
        + layer[y0, x1] * tx * (1 - ty)
        + layer[y1, x0] * (1 - tx) * ty
        + layer[y1, x1] * tx * ty
    )


def np_daisy(img, coords):
    """(H, W) image + (K, 2) [x, y] coords -> (K, 200) unnormalized DAISY."""
    f = _np_blur(img.astype(np.float64), 0.5)

    # central-difference gradients on a REFLECT_101-padded field
    fp = np.pad(f, 1, mode="reflect")
    gx = (fp[1:-1, 2:] - fp[1:-1, :-2]) * 0.5
    gy = (fp[2:, 1:-1] - fp[:-2, 1:-1]) * 0.5

    # 8 rectified orientation layers: max(0, cos(t)*gx + sin(t)*gy)
    layers = []
    for o in range(Q_HIST):
        t = 2.0 * np.pi * o / Q_HIST
        layers.append(np.maximum(np.cos(t) * gx + np.sin(t) * gy, 0.0))

    # per-ring cumulative sigmas R*(i+1)/(2*Q); smoothing is incremental
    # (sigma_inc = sqrt(s_i^2 - s_{i-1}^2)) exactly like the paper's cubes
    sigmas = [RADIUS * (i + 1) / (2 * Q_RADIUS) for i in range(Q_RADIUS)]
    cubes, prev, cur = [], 0.0, layers
    for s in sigmas:
        inc = np.sqrt(s * s - prev * prev)
        cur = [_np_blur(l, inc) for l in cur]
        cubes.append(cur)
        prev = s

    # grid: center (innermost cube) + 3 rings x 8 points, angle 2*pi*k/8,
    # ring radius R*(ring+1)/Q_RADIUS
    descs = []
    for (cx, cy) in np.asarray(coords, np.float64):
        hist = [[_np_bilinear(cubes[0][o], cx, cy) for o in range(Q_HIST)]]
        for ring in range(Q_RADIUS):
            r = RADIUS * (ring + 1) / Q_RADIUS
            for k in range(Q_THETA):
                a = 2.0 * np.pi * k / Q_THETA
                px, py = cx + r * np.cos(a), cy + r * np.sin(a)
                hist.append([_np_bilinear(cubes[ring][o], px, py) for o in range(Q_HIST)])
        descs.append(np.concatenate(hist))
    return np.asarray(descs)


# ------------------------------------------------------------------- tests


@pytest.fixture(scope="module")
def small_img(rng=np.random.default_rng(7)):
    # smooth-ish content so gradients are non-trivial everywhere
    base = rng.random((96, 112)).astype(np.float32)
    k, r = _np_gauss_kernel(2.0)
    img = base
    for axis in (0, 1):
        moved = np.moveaxis(img, axis, -1)
        padded = np.pad(moved, [(0, 0), (r, r)], mode="reflect")
        win = np.lib.stride_tricks.sliding_window_view(padded, len(k), axis=-1)
        img = np.moveaxis(win @ k, -1, axis)
    return (img * 255).astype(np.float32)


def test_daisy_matches_numpy_golden(small_img):
    rng = np.random.default_rng(3)
    # interior points (descriptor support fits) AND near-border points
    # (exercises the clamped taps)
    pts = np.concatenate(
        [
            np.stack(
                [rng.uniform(30, 80, 12), rng.uniform(30, 64, 12)], axis=-1
            ),
            np.asarray([[2.0, 3.0], [110.0, 94.0], [5.5, 90.25]]),
        ]
    ).astype(np.float32)
    got = np.asarray(daisy_at_points(jnp.asarray(small_img), jnp.asarray(pts), normalize=False))
    want = np_daisy(small_img, pts)
    assert got.shape == (len(pts), DAISY_DIM)
    scale = max(np.abs(want).max(), 1e-6)
    assert np.max(np.abs(got - want)) / scale < 2e-4, (
        f"max rel err {np.max(np.abs(got - want)) / scale:.2e}"
    )


def test_daisy_grid_geometry_pinned():
    """The 25-point grid and ring->cube assignment, pinned independently."""
    from microaligner_tpu.features.daisy import _grid_offsets, _ring_of_point, _sigmas

    offs = _grid_offsets()
    assert offs.shape == (1 + Q_RADIUS * Q_THETA, 2)
    assert np.allclose(offs[0], 0.0)
    for ring in range(Q_RADIUS):
        pts = offs[1 + ring * Q_THETA : 1 + (ring + 1) * Q_THETA]
        np.testing.assert_allclose(
            np.hypot(pts[:, 0], pts[:, 1]), RADIUS * (ring + 1) / Q_RADIUS, rtol=1e-6
        )
        angles = np.arctan2(pts[:, 1], pts[:, 0]) % (2 * np.pi)
        np.testing.assert_allclose(
            np.sort(angles), 2 * np.pi * np.arange(Q_THETA) / Q_THETA, atol=1e-5
        )
    np.testing.assert_array_equal(
        _ring_of_point(), [0] + [r for r in range(Q_RADIUS) for _ in range(Q_THETA)]
    )
    np.testing.assert_allclose(_sigmas(), [3.5, 7.0, 10.5], rtol=1e-6)


def test_daisy_normalized_is_unit_norm(small_img):
    pts = np.asarray([[40.0, 40.0], [60.0, 50.0]], np.float32)
    d = np.asarray(daisy_at_points(jnp.asarray(small_img), jnp.asarray(pts)))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
