"""A/B Pallas kernel block sizes at the 20k dense-band geometry.

The round-5 stage probe measured ~10 us of fixed overhead per Mosaic grid
step (update kernel: 1659 steps -> 16.5 ms; solve pass 1+2: ~1800 steps ->
10.6 ms), with the roofline (HBM+MXU) at ~2 ms — the kernels are
grid-step-overhead-bound.  This sweeps the block parameters that set the
step count:

  * pallas_update_matrices col_block (1024 default -> 2048, 4096)
  * pallas_sample_displaced col_block (1024 -> 2048, 4096)
  * pallas_smooth5_solve _HB (pass-1 rows, 256 -> 512, 1024) and pass-2 wb

Run exclusively on the tunnel: python scripts/probe_block_sizes.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )

    import microaligner_tpu.ops.pallas_agg as agg
    import microaligner_tpu.ops.pallas_matrices as pm
    import microaligner_tpu.ops.pallas_sample as ps
    # the optflow package rebinds the `farneback` attr to the jitted fn, so
    # plain `import ... as fb` resolves to the function; go via sys.modules
    import importlib

    fb = importlib.import_module("microaligner_tpu.optflow.farneback")

    K = 4
    reps = 3
    h, w = 1256, 20680
    rng = np.random.default_rng(0)
    rdt = fb._r_storage_dtype(99)
    mdt = fb._m_storage_dtype(99)
    R0 = jnp.asarray(rng.standard_normal((1, 5, h, w)), jnp.float32).astype(rdt)
    R1 = jnp.asarray(rng.standard_normal((1, 5, h, w)), jnp.float32).astype(rdt)
    fx = jnp.asarray((rng.random((1, h, w)) - 0.5) * 3, jnp.float32)
    fy = jnp.asarray((rng.random((1, h, w)) - 0.5) * 3, jnp.float32)
    M = jnp.asarray(rng.standard_normal((1, 5, h, w)), jnp.float32).astype(mdt)
    img = jnp.asarray(rng.random((1, h, w)), jnp.float32)

    def bench(label, fn, *xs):
        try:
            out = fn(*xs)
            jax.block_until_ready(out)
            leaf = jax.tree.leaves(out)[0]
            float(jnp.sum(leaf.ravel()[:2].astype(jnp.float32)))
            best = 1e9
            for _ in range(reps):
                t0 = time.perf_counter()
                out = fn(*xs)
                leaf = jax.tree.leaves(out)[0]
                float(jnp.sum(leaf.ravel()[:2].astype(jnp.float32)))
                best = min(best, time.perf_counter() - t0)
            print(f"{label:48s} {best / K * 1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{label:48s} FAILED: {repr(e)[:140]}", flush=True)

    # ---- update matrices: col_block sweep (K-chained) ----
    for cb in (1024, 2048, 4096):
        @jax.jit
        def upd_k(r0, r1, fx_, fy_, cb=cb):
            m = None
            for _ in range(K):
                m = pm.pallas_update_matrices(
                    r0, r1, fx_, fy_, band=7, out_dtype=mdt, col_block=cb
                )
                fx_ = fx_ + m[:, 0].ravel()[0].astype(jnp.float32) * 1e-20
            return m

        bench(f"update_matrices col_block={cb}", upd_k, R0, R1, fx, fy)

    # ---- banded sample: col_block sweep ----
    for cb in (1024, 2048, 4096):
        @jax.jit
        def samp_k(im, fx_, fy_, cb=cb):
            o = None
            for _ in range(K):
                o = ps.pallas_sample_displaced(im, fx_, fy_, band=7, col_block=cb)
                fx_ = fx_ + o.ravel()[0] * 1e-20
            return o

        bench(f"sample_displaced col_block={cb}", samp_k, img, fx, fy)

    # ---- multi-plane sample (8 planes, shared flow) ----
    imgs8 = jnp.asarray(rng.random((8, 4096, 4096)), jnp.float32)
    fx8 = jnp.asarray((rng.random((4096, 4096)) - 0.5) * 3, jnp.float32)
    fy8 = jnp.asarray((rng.random((4096, 4096)) - 0.5) * 3, jnp.float32)

    @jax.jit
    def multi_k(im, fx_, fy_):
        o = None
        for _ in range(K):
            o = ps.pallas_sample_displaced_multi(im, fx_, fy_, band=7)
            fx_ = fx_ + o.ravel()[0] * 1e-20
        return o

    bench("sample_multi 8x4096^2 shared flow", multi_k, imgs8, fx8, fy8)

    @jax.jit
    def per_plane_k(im, fx_, fy_):
        o = None
        for _ in range(K):
            o = ps.pallas_sample_displaced(
                im, jnp.broadcast_to(fx_, im.shape), jnp.broadcast_to(fy_, im.shape)
            )
            fx_ = fx_ + o.ravel()[0] * 1e-20
        return o

    bench("sample per-plane 8x4096^2 (old path)", per_plane_k, imgs8, fx8, fy8)

    # ---- solve: pass-1 row block sweep via module constant ----
    # call the unjitted body (__wrapped__): the inner jit's jaxpr cache would
    # otherwise capture the first _HB and ignore the monkeypatched value
    solve_body = agg.pallas_smooth5_solve.__wrapped__
    for hb in (256, 512, 1024):
        agg._HB = hb

        @jax.jit
        def solve_k(m, hb=hb):  # hb keys the outer trace
            fx_ = fy_ = None
            for _ in range(K):
                fx_, fy_ = solve_body(m, 99)
                m = m + (fx_.ravel()[0] * 1e-20).astype(m.dtype)
            return fx_, fy_

        bench(f"smooth5_solve _HB={hb}", solve_k, M)
    agg._HB = 256

    # ---- solve: pass-2 column width sweep ----
    for wb in (256, 384, 512, 768):
        @jax.jit
        def solve_wb_k(m, wb=wb):
            fx_ = fy_ = None
            for _ in range(K):
                fx_, fy_ = agg.pallas_smooth5_solve(m, 99, col_block=wb)
                m = m + (fx_.ravel()[0] * 1e-20).astype(m.dtype)
            return fx_, fy_

        bench(f"smooth5_solve pass2 wb={wb}", solve_wb_k, M)

    # ---- fused poly pair + zero-flow M: col_block sweep at band geometry ----
    img2 = jnp.asarray(rng.random((1, h, w)) * 255, jnp.float32)
    pp = importlib.import_module("microaligner_tpu.ops.pallas_poly")
    coeffs = fb._poly_coeff_tuple(1, 1.7)
    for cb in (1024, 2048):
        @jax.jit
        def pair_k2(a, b, cb=cb):
            r0 = r1 = m = None
            for _ in range(K):
                sa = fb._pre_smooth(a[0])[None]
                sb = fb._pre_smooth(b[0])[None]
                spa = jnp.pad(sa, ((0, 0), (1, 1), (1, 1)), mode="edge")
                spb = jnp.pad(sb, ((0, 0), (1, 1), (1, 1)), mode="edge")
                r0, r1, m = pp.pallas_poly_pair_m(
                    spa, spb, coeffs,
                    m_dtype=mdt, r_dtype=rdt, col_block=cb,
                )
                a = a + m[:, 0].ravel()[0].astype(jnp.float32) * 1e-20
            return r0, r1, m

        bench(f"poly_pair_m col_block={cb} (incl. pre-smooth)", pair_k2, img2, img2 + 1)


if __name__ == "__main__":
    main()
