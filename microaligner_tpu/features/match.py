"""Exact knn matching + Lowe ratio filter on the MXU.

Replaces ``cv.FlannBasedMatcher.knnMatch(des_mov, des_ref, k=2)`` + the 0.5
ratio test (reference feature_detection.py:130-141).  FLANN's randomized
KD-trees are approximate; an exact top-2 over a distance matrix computed as
one batched matmul is both faster on TPU and strictly better-matched.
FLANN reports true (unsquared) L2 distances (verified empirically), so the
0.5 ratio threshold applies to unsquared distances — we compare squared
distances against ``0.25 * d2`` equivalently.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["knn_top2", "match_descriptors"]

_BIG = jnp.float32(3.4e38)


@functools.partial(jax.jit, static_argnames=("chunk",))
def knn_top2(query: jax.Array, train: jax.Array, q_valid: jax.Array, t_valid: jax.Array, chunk: int = 4096):
    """For each valid query row: the two smallest squared L2 distances over
    valid train rows.  Returns (d1, d2, idx1) each (Q,)."""
    qn = jnp.sum(query * query, axis=1)
    tn = jnp.sum(train * train, axis=1)
    tmask = jnp.where(t_valid, 0.0, _BIG)

    q = query.shape[0]
    pad = (-q) % chunk
    qp = jnp.pad(query, ((0, pad), (0, 0)))
    qnp_ = jnp.pad(qn, (0, pad))
    nchunks = qp.shape[0] // chunk
    # bf16 operands for the cross-term matmul (see note in the loop body);
    # only on TPU — CPU bf16 matmuls are emulated and slower than f32.
    # MICROALIGNER_TPU_MATCH_F32=1 keeps f32 on TPU too (parity checks; read
    # at trace time — set before the first register() call).
    import os

    force_f32 = os.environ.get("MICROALIGNER_TPU_MATCH_F32", "0") == "1"
    lp_dtype = (
        jnp.float32
        if force_f32 or jax.default_backend() == "cpu"
        else jnp.bfloat16
    )
    qp_lp = qp.astype(lp_dtype)
    train_lp = train.astype(lp_dtype)

    def body(i, acc):
        d1a, d2a, i1a = acc
        qs = jax.lax.dynamic_slice_in_dim(qp_lp, i * chunk, chunk, 0)
        qns = jax.lax.dynamic_slice_in_dim(qnp_, i * chunk, chunk, 0)
        # squared distances: |q|^2 + |t|^2 - 2 q.t.  The cross term runs as a
        # bf16 matmul with f32 accumulation: descriptors are unit-normalized,
        # so bf16 rounding perturbs distances ~0.4% relative — far inside the
        # 0.5 Lowe-ratio margin — and the MXU runs bf16 at 4x the f32 rate.
        # (|q|^2 and |t|^2 stay exact f32.)  On CPU Precision.DEFAULT keeps
        # full f32, so test goldens are unchanged.
        cross = jnp.dot(qs, train_lp.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
        d = qns[:, None] + tn[None, :] - 2.0 * cross + tmask[None, :]
        d = jnp.maximum(d, 0.0)
        # top-2 via three reductions: lax.top_k lowers to a full per-row SORT
        # on TPU (seconds at 45k train rows); min/argmin/masked-min are plain
        # VPU sweeps
        d1 = jnp.min(d, axis=1)
        i1 = jnp.argmin(d, axis=1).astype(jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        d2 = jnp.min(jnp.where(cols == i1[:, None], _BIG, d), axis=1)
        d1a = jax.lax.dynamic_update_slice_in_dim(d1a, d1, i * chunk, 0)
        d2a = jax.lax.dynamic_update_slice_in_dim(d2a, d2, i * chunk, 0)
        i1a = jax.lax.dynamic_update_slice_in_dim(i1a, i1, i * chunk, 0)
        return d1a, d2a, i1a

    init = (
        jnp.zeros(qp.shape[0], jnp.float32),
        jnp.zeros(qp.shape[0], jnp.float32),
        jnp.zeros(qp.shape[0], jnp.int32),
    )
    d1, d2, i1 = jax.lax.fori_loop(0, nchunks, body, init)
    return d1[:q], d2[:q], i1[:q]


@jax.jit
def match_descriptors(
    des_ref: jax.Array,
    des_mov: jax.Array,
    ref_valid: jax.Array,
    mov_valid: jax.Array,
    ratio: float = 0.5,
):
    """Lowe-ratio-filtered matches mov -> ref.

    Mirrors the reference (feature_detection.py:134-141): query = mov
    descriptors, train = ref, keep matches with d1 < ratio * d2 (true L2).
    Returns ``(good (Q,) bool, ref_idx (Q,) int32)`` aligned with mov rows.
    """
    d1, d2, i1 = knn_top2(des_mov, des_ref, mov_valid, ref_valid)
    # d are squared; L2 test d1 < (ratio*d2)  <=>  d1^2 < ratio^2 * d2^2
    good = (d1 < (ratio * ratio) * d2) & mov_valid
    return good, i1
