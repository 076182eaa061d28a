"""Normalized mutual information scoring — the registration quality gate.

TPU-native equivalent of ``sklearn.metrics.normalized_mutual_info_score``
chunked as in the reference (shared_modules/similarity_scoring.py:27-68):
images are flattened, split into ``tile_size**2``-element chunks, each chunk's
NMI (arithmetic-mean normalization, natural log) is computed from a 256x256
joint histogram, and the chunk scores are averaged.  Whole-image NMI is used
when ``max(shape)/tile_size < 2`` — same gating as ``mi_tiled``.

The joint histogram is built with a one-hot matmul so the reduction rides the
MXU instead of a serialized scatter.  Counts are exact in float32 for chunks
below 2**24 elements.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from microaligner_tpu.utils.logging import log, stage_timer

__all__ = [
    "nmi_u8",
    "mi_tiled",
    "mi_tiled_traced",
    "mutual_information_test",
    "check_if_higher_similarity",
]

_BINS = 256


def _hist_batched(a2: jax.Array, b2: jax.Array, valid2: jax.Array) -> jax.Array:
    """(N, M) int32 chunk pairs -> (N, 256, 256) joint histograms.

    One-hot rows are bf16 (0/1 exact) and accumulate in f32 on the MXU, so
    counts are exact below 2**24 per cell.  The inner subchunk loop is a scan
    of BATCHED matmuls — one big MXU launch per step instead of one tiny
    matmul per chunk.
    """
    n, m = a2.shape
    sub = 1 << 13
    pad = (-m) % sub
    if pad:
        a2 = jnp.pad(a2, ((0, 0), (0, pad)))
        b2 = jnp.pad(b2, ((0, 0), (0, pad)))
        valid2 = jnp.pad(valid2, ((0, 0), (0, pad)))
    nsub = a2.shape[1] // sub
    a3 = a2.reshape(n, nsub, sub).transpose(1, 0, 2)  # (S, N, sub)
    b3 = b2.reshape(n, nsub, sub).transpose(1, 0, 2)
    v3 = valid2.reshape(n, nsub, sub).transpose(1, 0, 2)

    def body(carry, xs):
        ai, bi, vi = xs
        onea = jax.nn.one_hot(ai, _BINS, dtype=jnp.bfloat16) * vi[..., None].astype(jnp.bfloat16)
        oneb = jax.nn.one_hot(bi, _BINS, dtype=jnp.bfloat16)
        h = jax.lax.dot_general(
            onea, oneb,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),  # (N, 256, 256)
            preferred_element_type=jnp.float32,
        )
        return carry + h, None

    init = jnp.zeros((n, _BINS, _BINS), jnp.float32)
    hist, _ = jax.lax.scan(body, init, (a3, b3, v3))
    return hist


def _joint_hist_256(a: jax.Array, b: jax.Array) -> jax.Array:
    """Exact 256x256 joint histogram of two flat u8 arrays via MXU matmuls."""
    n = a.shape[0]
    av = a.astype(jnp.int32)[None, :]
    bv = b.astype(jnp.int32)[None, :]
    valid = jnp.ones((1, n), jnp.float32)
    return _hist_batched(av, bv, valid)[0]


def _entropy(p: jax.Array) -> jax.Array:
    """Shannon entropy in nats; 0*log(0) := 0."""
    return -jnp.sum(jnp.where(p > 0, p * jnp.log(jnp.maximum(p, 1e-30)), 0.0))


@jax.jit
def _nmi_from_hist(hist: jax.Array) -> jax.Array:
    n = jnp.sum(hist)
    pxy = hist / n
    px = jnp.sum(pxy, axis=1)
    py = jnp.sum(pxy, axis=0)
    hx = _entropy(px)
    hy = _entropy(py)
    hxy = _entropy(pxy)
    mi = hx + hy - hxy
    mi = jnp.maximum(mi, 0.0)
    denom = 0.5 * (hx + hy)
    # sklearn convention: a single-cluster labeling on either side gives NMI=1
    # when both are single-cluster (MI==0, denom==0 -> defined as 1.0); in
    # practice sklearn returns 1.0 for identical constant arrays and ~0 when
    # only one side is constant.  Guard the 0/0 case to 1.0 like sklearn.
    return jnp.where(denom > 0, mi / jnp.maximum(denom, 1e-30), 1.0)


@jax.jit
def _nmi_u8_core(a: jax.Array, b: jax.Array) -> jax.Array:
    return _nmi_from_hist(_joint_hist_256(a, b))


def nmi_u8(a, b) -> float:
    """Normalized mutual information of two u8 arrays (flattened)."""
    a = jnp.asarray(a).reshape(-1)
    b = jnp.asarray(b).reshape(-1)
    return float(_nmi_u8_core(a, b))


@functools.partial(jax.jit, static_argnames=("nchunks", "chunk"))
def _chunked_mean_nmi(a: jax.Array, b: jax.Array, nchunks: int, chunk: int) -> jax.Array:
    """Per-chunk NMI over equal chunks, all chunks batched through the MXU;
    the last partial chunk is handled by the caller."""
    a2 = a[: nchunks * chunk].reshape(nchunks, chunk).astype(jnp.int32)
    b2 = b[: nchunks * chunk].reshape(nchunks, chunk).astype(jnp.int32)
    hists = _hist_batched(a2, b2, jnp.ones_like(a2, jnp.float32))
    return jax.vmap(_nmi_from_hist)(hists)


def mi_tiled(arr1, arr2, tile_size: int) -> float:
    """Chunked-mean NMI exactly mirroring ``mi_tiled``
    (shared_modules/similarity_scoring.py:27-50): flatten row-major, split at
    multiples of ``tile_size**2``, score each non-empty chunk, average.

    Accepts numpy or device arrays; all heavy work stays on device — only the
    per-chunk scores come back to the host.
    """
    a = jnp.asarray(arr1).reshape(-1)
    b = jnp.asarray(arr2).reshape(-1)
    if max(arr1.shape) / tile_size < 2:
        return nmi_u8(a, b)
    chunk = tile_size * tile_size
    nfull = int(a.size) // chunk
    scores: List[float] = []
    if nfull > 0:
        scores.extend(
            np.asarray(jax.device_get(_chunked_mean_nmi(a, b, nfull, chunk))).tolist()
        )
    rem = int(a.size) - nfull * chunk
    if rem > 0:
        scores.append(nmi_u8(a[nfull * chunk :], b[nfull * chunk :]))
    return float(np.mean(scores))


def mi_tiled_traced(arr1: jax.Array, arr2: jax.Array, tile_size: int) -> jax.Array:
    """``mi_tiled`` as a traceable scalar (same chunking, same mean), for use
    inside fused jitted programs — shapes are static at trace time, so the
    chunk split is resolved in Python exactly as the host version does."""
    a = arr1.reshape(-1)
    b = arr2.reshape(-1)
    if max(arr1.shape) / tile_size < 2:
        return _nmi_u8_core(a, b)
    chunk = tile_size * tile_size
    nfull = a.shape[0] // chunk
    scores = []
    if nfull > 0:
        a2 = a[: nfull * chunk].reshape(nfull, chunk).astype(jnp.int32)
        b2 = b[: nfull * chunk].reshape(nfull, chunk).astype(jnp.int32)
        hists = _hist_batched(a2, b2, jnp.ones_like(a2, jnp.float32))
        scores.append(jax.vmap(_nmi_from_hist)(hists))
    if a.shape[0] - nfull * chunk > 0:
        scores.append(_nmi_u8_core(a[nfull * chunk :], b[nfull * chunk :])[None])
    return jnp.mean(jnp.concatenate([s.reshape(-1) for s in scores]))


def mutual_information_test(ref_arr, test_arr, init_arr, tile_size: int) -> Tuple[float, float]:
    after = mi_tiled(ref_arr, test_arr, tile_size)
    before = mi_tiled(ref_arr, init_arr, tile_size)
    return after, before


def check_if_higher_similarity(ref_arr, test_arr, init_arr, tile_size: int) -> List[bool]:
    """Returns ``[MI(ref, test) > MI(ref, init)]`` — the accept/reject gate
    used by both registrators (similarity_scoring.py:61-68)."""
    after, before = mutual_information_test(ref_arr, test_arr, init_arr, tile_size)
    log("    MI score after:", after, "| MI score before:", before)
    return [after > before]
