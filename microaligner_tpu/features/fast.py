"""FAST-9/16 corner detection as a dense XLA kernel.

TPU-native replacement for ``cv.FastFeatureDetector`` (threshold=1, nonmax
suppression, TYPE_9_16 — reference feature_detection.py:92-94).  The sparse
detector becomes a dense score map + top-k: every pixel's 16-pixel Bresenham
ring is tested for a >=9-long contiguous brighter/darker arc, the corner
score is OpenCV's max-threshold-minus-one, non-maxima are suppressed on the
3x3 neighborhood, and the strongest ``k`` corners are selected with
stable (scan-order) tie-breaking like Python's ``sorted``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fast_score_map", "fast_detect_topk"]

# Bresenham circle of radius 3, OpenCV pixel order, as (dy, dx)
_RING = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3),
        (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3),
        (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)

_ARC = 9  # TYPE_9_16: at least 9 contiguous ring pixels


def _ring_values(img: jax.Array) -> jax.Array:
    """(H, W) -> (16, H, W) ring neighbor values (replicate-padded borders;
    the 3px frame is masked out of the score map anyway)."""
    h, w = img.shape
    p = jnp.pad(img, 3, mode="edge")
    vals = [p[3 + dy : 3 + dy + h, 3 + dx : 3 + dx + w] for dy, dx in _RING]
    return jnp.stack(vals)


@functools.partial(jax.jit, static_argnames=("threshold",))
def fast_score_map(img: jax.Array, threshold: int = 1) -> jax.Array:
    """Dense FAST-9/16 score map; 0 where not a corner or non-max.

    Score matches OpenCV's cornerScore<16>: the largest threshold at which the
    pixel still passes, minus 1.
    """
    h, w = img.shape
    v = _ring_values(img).astype(jnp.int32)  # (16, H, W)
    p = img.astype(jnp.int32)[None]
    bright = v - p   # want min over arc > threshold
    dark = p - v

    def arc_score(d):
        # max over 16 arc starts of (min over 9 consecutive ring pixels)
        dd = jnp.concatenate([d, d[: _ARC - 1]], axis=0)  # (24, H, W)
        mins = [jnp.min(jax.lax.dynamic_slice_in_dim(dd, s, _ARC, 0), axis=0) for s in range(16)]
        return jnp.max(jnp.stack(mins), axis=0)

    score = jnp.maximum(arc_score(bright), arc_score(dark)) - 1

    # OpenCV only processes the region 3 px inside the frame; pixels outside it
    # have no score and cannot suppress their neighbors — mask BEFORE the NMS.
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (iy >= 3) & (iy < h - 3) & (ix >= 3) & (ix < w - 3)
    is_corner = (score >= threshold) & inside

    # 3x3 non-max suppression over corner scores (non-corners count as 0),
    # strictly greater than all 8 neighbors, like OpenCV
    s = jnp.where(is_corner, score, 0).astype(jnp.int32)
    sp = jnp.pad(s, 1, mode="constant")
    neigh = jnp.stack(
        [
            sp[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
            if not (dy == 0 and dx == 0)
        ]
    )
    keep = is_corner & (s > jnp.max(neigh, axis=0))
    return jnp.where(keep, s, 0)


@functools.partial(jax.jit, static_argnames=("k", "threshold"))
def fast_detect_topk(img: jax.Array, k: int, threshold: int = 1):
    """Top-k corners by response with scan-order tie-break.

    Returns ``(coords (k, 2) float32 [x, y], response (k,) float32,
    valid (k,) bool)``.  Matches the reference's
    ``sorted(kp, key=response, reverse=True)[:k]`` (feature_detection.py:107),
    which is stable, i.e. ties keep detector scan order (row-major).
    """
    h, w = img.shape
    s = fast_score_map(img, threshold=threshold).reshape(-1)
    n = h * w
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    if 256 * n - 1 <= np.iinfo(np.int32).max:
        # composite integer key: score major (<=255), reverse scan index minor
        key = s * n + (n - 1 - idx)
        top_keys, top_idx = jax.lax.top_k(key, k)
        valid = top_keys >= (threshold * n)  # score >= threshold
        resp = (top_keys // n).astype(jnp.float32)
    else:
        # >= ~8.4 Mpix (TileSize >~ 2900): the composite key overflows int32,
        # so fall back to a stable sort — ties keep scan order by stability
        neg, sorted_idx = jax.lax.sort((-s, idx), num_keys=1, is_stable=True)
        top_s = -jax.lax.slice_in_dim(neg, 0, k, axis=0)
        top_idx = jax.lax.slice_in_dim(sorted_idx, 0, k, axis=0)
        valid = top_s >= threshold
        resp = top_s.astype(jnp.float32)
    ys = (top_idx // w).astype(jnp.float32)
    xs = (top_idx % w).astype(jnp.float32)
    coords = jnp.stack([xs, ys], axis=-1)
    return coords, resp, valid
