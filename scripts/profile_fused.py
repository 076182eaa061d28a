"""Per-stage on-chip timings for the fused register step (bench config 2).

Times each stage of the tiled Farneback register+warp step at the bench
geometry (25 halo tiles of 1200², win 99, 3 iterations) with K-chained jitted
invocations so the tunneled dispatch cost amortizes.  Run on the real TPU:

    python scripts/profile_fused.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

N, T = 25, 1200
WIN = 99
BAND = 7
K = 4


def timed(name, fn, *args):
    g = jax.jit(fn)
    out = g(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(g(*args))
        times.append(time.perf_counter() - t0)
    dt = min(times) / K
    print(f"{name:34s} {dt*1e3:8.2f} ms")
    return dt


def main():
    from microaligner_tpu.optflow.farneback import (
        _farneback_core_batched,
        _poly_exp_batched,
        _update_flow_gaussian_cf,
        _update_matrices_batched_cf,
        _update_matrices_zero_flow_cf,
    )
    from microaligner_tpu.ops.warp import warp_with_flow_batched

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((N, T, T)) * 255, jnp.float32)
    movs = jnp.asarray(rng.random((N, T, T)) * 255, jnp.float32)

    def k_chain(fn):
        def rep(*args):
            acc = None
            for k in range(K):
                shifted = [a + float(k) for a in args]
                o = fn(*shifted)
                s = jax.tree_util.tree_reduce(
                    lambda x, y: x + jnp.sum(y.astype(jnp.float32)), o, 0.0
                )
                acc = s if acc is None else acc + s
            return acc

        return rep

    # stage inputs (materialized once, on device)
    r0 = _poly_exp_batched(movs, 1, 1.7)
    r1 = _poly_exp_batched(imgs, 1, 1.7)
    m0 = jax.vmap(_update_matrices_zero_flow_cf)(r0, r1)
    fx, fy = _update_flow_gaussian_cf(m0, WIN)
    flow = jnp.stack([fx, fy], axis=-1)
    jax.block_until_ready((r0, m0, flow))

    timed("poly_exp (one image set, N=25)", k_chain(lambda x: _poly_exp_batched(x, 1, 1.7)), imgs)
    timed("zero-flow matrices", k_chain(lambda a, b: jax.vmap(_update_matrices_zero_flow_cf)(a, b)), r0, r1)
    timed("update_matrices (banded)", k_chain(lambda a, b, x, y: _update_matrices_batched_cf(a, b, x, y)), r0, r1, fx, fy)
    timed("smooth5_solve (win 99)", k_chain(lambda m: jnp.stack(_update_flow_gaussian_cf(m, WIN), -1)), m0)
    timed("warp_with_flow_batched", k_chain(warp_with_flow_batched), movs, flow)
    timed(
        "FULL step (3 iters, poly..warp)",
        k_chain(
            lambda a, b: warp_with_flow_batched(
                a, _farneback_core_batched(a, b, WIN, 3, 1, 1.7)
            )
        ),
        movs,
        imgs,
    )

    from microaligner_tpu.optflow.farneback import _farneback_core_parts
    from microaligner_tpu.ops.warp import warp_with_flow_parts_batched

    def full_parts(a, b):
        px, py = _farneback_core_parts(a, b, WIN, 3, 1, 1.7)
        return warp_with_flow_parts_batched(a, px, py)

    timed("FULL step, fx/fy parts (no stack)", k_chain(full_parts), movs, imgs)


if __name__ == "__main__":
    main()
