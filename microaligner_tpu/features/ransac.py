"""Vectorized RANSAC for 4-DoF partial affine (rotation+scale+translation).

Replaces ``cv.estimateAffinePartial2D(method=RANSAC, confidence=0.99)``
(reference feature_detection.py:155-157) with a TPU-shaped estimator: all
hypotheses are drawn and scored at once (a batch of closed-form 2-point
similarity fits + one vmapped inlier count) instead of OpenCV's sequential
sampling, then the best hypothesis is refined by iterated least squares on
its inliers.  Deterministic given the PRNG key.

Model: [x'] = [a -b] [x] + [tx]
       [y']   [b  a] [y]   [ty]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["estimate_affine_partial_2d"]

_REPROJ_THR = 3.0  # OpenCV default ransacReprojThreshold
_NUM_HYPOTHESES = 2048  # ~ OpenCV maxIters default (2000), padded for shape
_REFINE_ROUNDS = 3


def _fit_two_points(p: jax.Array, q: jax.Array) -> jax.Array:
    """Closed-form similarity from 2 point pairs p->q; returns (4,) [a,b,tx,ty]."""
    dp = p[1] - p[0]
    dq = q[1] - q[0]
    den = dp[0] * dp[0] + dp[1] * dp[1]
    den = jnp.where(den > 1e-12, den, 1e-12)
    a = (dp[0] * dq[0] + dp[1] * dq[1]) / den
    b = (dp[0] * dq[1] - dp[1] * dq[0]) / den
    tx = q[0, 0] - (a * p[0, 0] - b * p[0, 1])
    ty = q[0, 1] - (b * p[0, 0] + a * p[0, 1])
    return jnp.stack([a, b, tx, ty])


def _residual2(params: jax.Array, src: jax.Array, dst: jax.Array) -> jax.Array:
    a, b, tx, ty = params[0], params[1], params[2], params[3]
    px = a * src[:, 0] - b * src[:, 1] + tx
    py = b * src[:, 0] + a * src[:, 1] + ty
    return (px - dst[:, 0]) ** 2 + (py - dst[:, 1]) ** 2


def _weighted_ls(src: jax.Array, dst: jax.Array, wgt: jax.Array) -> jax.Array:
    """Weighted least-squares similarity fit (linear in [a,b,tx,ty])."""
    n = jnp.maximum(jnp.sum(wgt), 1e-9)
    mx = jnp.sum(wgt * src[:, 0]) / n
    my = jnp.sum(wgt * src[:, 1]) / n
    ux = jnp.sum(wgt * dst[:, 0]) / n
    uy = jnp.sum(wgt * dst[:, 1]) / n
    sx = src[:, 0] - mx
    sy = src[:, 1] - my
    dx = dst[:, 0] - ux
    dy = dst[:, 1] - uy
    den = jnp.sum(wgt * (sx * sx + sy * sy))
    den = jnp.where(den > 1e-12, den, 1e-12)
    a = jnp.sum(wgt * (sx * dx + sy * dy)) / den
    b = jnp.sum(wgt * (sx * dy - sy * dx)) / den
    tx = ux - (a * mx - b * my)
    ty = uy - (b * mx + a * my)
    return jnp.stack([a, b, tx, ty])


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def _ransac_core(src, dst, valid, key, num_hypotheses):
    n = src.shape[0]
    nvalid = jnp.sum(valid)
    # sample pair indices only among valid rows: draw from [0, nvalid) and map
    order = jnp.argsort(~valid)  # valid rows first
    k1, k2 = jax.random.split(key)
    denom = jnp.maximum(nvalid, 1)
    i0 = jax.random.randint(k1, (num_hypotheses,), 0, denom)
    i1 = jax.random.randint(k2, (num_hypotheses,), 0, denom)
    i1 = jnp.where(i1 == i0, (i1 + 1) % denom, i1)
    p0 = order[i0]
    p1 = order[i1]

    pairs_src = jnp.stack([src[p0], src[p1]], axis=1)  # (N, 2, 2)
    pairs_dst = jnp.stack([dst[p0], dst[p1]], axis=1)
    params = jax.vmap(_fit_two_points)(pairs_src, pairs_dst)  # (N, 4)

    w = valid.astype(jnp.float32)
    r2 = jax.vmap(lambda pr: _residual2(pr, src, dst))(params)  # (N, n)
    inl = (r2 <= _REPROJ_THR * _REPROJ_THR) & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    best_params = params[best]
    best_count = counts[best]

    # refinement: iterated LS on the inlier set (OpenCV refines with LM;
    # the similarity LS problem is linear so this reaches the same optimum)
    def refine(_, pr):
        r = _residual2(pr, src, dst)
        win = ((r <= _REPROJ_THR * _REPROJ_THR) & valid).astype(jnp.float32)
        return _weighted_ls(src, dst, win)

    refined = jax.lax.fori_loop(0, _REFINE_ROUNDS, refine, best_params)
    rr = _residual2(refined, src, dst)
    refined_count = jnp.sum((rr <= _REPROJ_THR * _REPROJ_THR) & valid)
    # like OpenCV: the final model IS the refined one (no keep-best guard);
    # guard only against a degenerate refinement that collapses the model
    degenerate = refined_count < 2
    final = jnp.where(degenerate, best_params, refined)
    final_count = jnp.where(degenerate, best_count, refined_count)
    return final, final_count


def estimate_affine_partial_2d(src, dst, valid=None, seed: int = 0, nvalid_hint=None):
    """Estimate the 2x3 partial-affine matrix mapping src -> dst.

    Returns ``(tmat (2,3) float64 numpy, inlier_count int)``; identity and
    count 0 when fewer than 2 valid pairs are given.  ``nvalid_hint`` skips
    the device round trip when the caller already counted the valid rows.
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    if valid is None:
        valid = jnp.ones(src.shape[0], bool)
    valid = jnp.asarray(valid, bool)
    nvalid = (
        int(nvalid_hint) if nvalid_hint is not None
        else int(jax.device_get(jnp.sum(valid)))
    )
    if nvalid < 2:
        return np.eye(2, 3), 0
    key = jax.random.PRNGKey(seed)
    params, count = _ransac_core(src, dst, valid, key, _NUM_HYPOTHESES)
    params_np, count_np = jax.device_get((params, count))  # one round trip
    a, b, tx, ty = np.asarray(params_np, np.float64)
    tmat = np.array([[a, -b, tx], [b, a, ty]])
    return tmat, int(count_np)
