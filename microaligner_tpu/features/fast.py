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

__all__ = ["fast_score_map", "fast_detect_topk", "fast_detect_topk_grid"]

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


def _raw_score(img: jax.Array) -> jax.Array:
    """Unmasked FAST-9/16 corner score at every pixel.

    Matches OpenCV's cornerScore<16>: the largest threshold at which the
    pixel still passes, minus 1.  u8 inputs compute in int16 (differences and
    scores fit, and the (24, H, W) arc stack is the dominant transient at
    whole-canvas sizes); wider dtypes keep int32.
    """
    dt = jnp.int16 if img.dtype == jnp.uint8 else jnp.int32
    v = _ring_values(img).astype(dt)  # (16, H, W)
    p = img.astype(dt)[None]
    bright = v - p   # want min over arc > threshold
    dark = p - v

    def arc_score(d):
        # max over 16 arc starts of (min over 9 consecutive ring pixels)
        dd = jnp.concatenate([d, d[: _ARC - 1]], axis=0)  # (24, H, W)
        mins = [jnp.min(jax.lax.dynamic_slice_in_dim(dd, s, _ARC, 0), axis=0) for s in range(16)]
        return jnp.max(jnp.stack(mins), axis=0)

    return jnp.maximum(arc_score(bright), arc_score(dark)) - 1


def _nms_keep(score: jax.Array, inside: jax.Array, threshold: int) -> jax.Array:
    """Mask + 3x3 non-max suppression: scores where the pixel is a kept
    corner, 0 elsewhere.  Masking happens BEFORE the NMS (pixels outside the
    processed region have no score and cannot suppress neighbors, like
    OpenCV's frame handling)."""
    h, w = score.shape
    is_corner = (score >= threshold) & inside
    s = jnp.where(is_corner, score, 0)
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


@functools.partial(jax.jit, static_argnames=("threshold",))
def fast_score_map(img: jax.Array, threshold: int = 1) -> jax.Array:
    """Dense FAST-9/16 score map; 0 where not a corner or non-max.

    OpenCV only processes the region 3 px inside the frame; pixels outside it
    have no score and cannot suppress their neighbors.
    """
    h, w = img.shape
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (iy >= 3) & (iy < h - 3) & (ix >= 3) & (ix < w - 3)
    return _nms_keep(_raw_score(img), inside, threshold).astype(jnp.int32)


def _topk_rows(s: jax.Array, k: int, threshold: int):
    """Per-row top-k by score with row-major (scan-order) tie-break.

    ``s``: (..., n) int32 score rows.  Returns ``(top_idx (..., k) int32,
    resp (..., k) float32, valid (..., k) bool)``.  Matches the reference's
    ``sorted(kp, key=response, reverse=True)[:k]`` (feature_detection.py:107),
    which is stable, i.e. ties keep detector scan order.
    """
    n = s.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
    if 256 * n - 1 <= np.iinfo(np.int32).max:
        # composite integer key: score major (<=255), reverse scan index minor
        key = s * n + (n - 1 - idx)
        top_keys, top_idx = jax.lax.top_k(key, k)
        valid = top_keys >= (threshold * n)  # score >= threshold
        resp = (top_keys // n).astype(jnp.float32)
    else:
        # >= ~8.4 Mpix rows (TileSize >~ 2900): the composite key overflows
        # int32; fall back to a stable sort — ties keep scan order by stability
        neg, sorted_idx = jax.lax.sort((-s, idx), num_keys=1, is_stable=True)
        top_s = -jax.lax.slice_in_dim(neg, 0, k, axis=-1)
        top_idx = jax.lax.slice_in_dim(sorted_idx, 0, k, axis=-1)
        valid = top_s >= threshold
        resp = top_s.astype(jnp.float32)
    return top_idx, resp, valid


@functools.partial(jax.jit, static_argnames=("k", "threshold"))
def fast_detect_topk(img: jax.Array, k: int, threshold: int = 1):
    """Top-k corners by response with scan-order tie-break.

    Returns ``(coords (k, 2) float32 [x, y], response (k,) float32,
    valid (k,) bool)``.
    """
    h, w = img.shape
    s = fast_score_map(img, threshold=threshold).reshape(-1)
    top_idx, resp, valid = _topk_rows(s, k, threshold)
    ys = (top_idx // w).astype(jnp.float32)
    xs = (top_idx % w).astype(jnp.float32)
    coords = jnp.stack([xs, ys], axis=-1)
    return coords, resp, valid


@functools.partial(jax.jit, static_argnames=("tile_h", "tile_w", "k", "threshold"))
def fast_detect_topk_grid(canvas: jax.Array, tile_h: int, tile_w: int, k: int,
                          threshold: int = 1):
    """Per-tile FAST top-k on a whole tiling canvas in ONE dense program.

    ``canvas`` is the zero-padded interior canvas ``(ny*tile_h, nx*tile_w)``
    (the concatenation of every tile's interior view).  Bit-exact with running
    ``fast_detect_topk`` on each ``(tile_h, tile_w)`` interior independently:
    the per-tile 3-px processing frame is masked BEFORE the NMS, so masked
    frame pixels cannot suppress across tile boundaries, and the top-k
    tie-break index is the within-tile scan order.  Replaces the serial
    per-tile ``lax.map`` (one whole-canvas score map + one batched top_k
    instead of N small launches).

    Returns ``(coords (N, k, 2) float32 tile-LOCAL [x, y], resp (N, k)
    float32, valid (N, k) bool)`` with tiles in row-major grid order.
    """
    h, w = canvas.shape
    ny, nx = h // tile_h, w // tile_w
    score = _raw_score(canvas)
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) % tile_h
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) % tile_w
    inside = (iy >= 3) & (iy < tile_h - 3) & (ix >= 3) & (ix < tile_w - 3)
    s = _nms_keep(score, inside, threshold).astype(jnp.int32)
    rows = (
        s.reshape(ny, tile_h, nx, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(ny * nx, tile_h * tile_w)
    )
    top_idx, resp, valid = _topk_rows(rows, k, threshold)
    ys = (top_idx // tile_w).astype(jnp.float32)
    xs = (top_idx % tile_w).astype(jnp.float32)
    coords = jnp.stack([xs, ys], axis=-1)
    return coords, resp, valid
