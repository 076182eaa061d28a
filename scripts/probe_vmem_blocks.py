"""A/B the raised scoped-VMEM limit + bigger block shapes on hardware.

The default Mosaic scoped-VMEM budget (~16 MB) is what capped
pallas_update_matrices at col_block 2048 (4096 fails to compile) and the
multi-plane sampler at cb_fit~3328.  v5e has 128 MB of physical VMEM;
MICROALIGNER_TPU_VMEM_LIMIT_MB raises the compiler budget so wider blocks
(fewer grid steps, less per-step fixed overhead) become compilable.  This
must run in a FRESH process (the limit is read at trace time).

Run exclusively on the tunnel: python scripts/probe_vmem_blocks.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["MICROALIGNER_TPU_VMEM_LIMIT_MB"] = os.environ.get(
    "MICROALIGNER_TPU_VMEM_LIMIT_MB", "100"
)

import numpy as np


def main():
    import importlib

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )

    import microaligner_tpu.ops.pallas_matrices as pm
    import microaligner_tpu.ops.pallas_sample as ps

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
            print(f"{label:52s} {best / K * 1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{label:52s} FAILED: {repr(e)[:120]}", flush=True)

    lim = os.environ["MICROALIGNER_TPU_VMEM_LIMIT_MB"]
    print(f"vmem limit: {lim} MB", flush=True)

    # ---- update matrices: wider blocks under the raised limit ----
    for cb in (2048, 4096):
        @jax.jit
        def upd_k(r0, r1, fx_, fy_, cb=cb):
            m = None
            for _ in range(K):
                m = pm.pallas_update_matrices(
                    r0, r1, fx_, fy_, band=7, out_dtype=mdt, col_block=cb
                )
                fx_ = fx_ + m[:, 0].ravel()[0].astype(jnp.float32) * 1e-20
            return m

        bench(f"update_matrices cb={cb} vmem={lim}", upd_k, R0, R1, fx, fy)

    # ---- banded sample: row_block x col_block under the raised limit ----
    for rb, cb in ((16, 4096), (32, 4096), (64, 4096), (32, 8192)):
        @jax.jit
        def samp_k(im, fx_, fy_, rb=rb, cb=cb):
            o = None
            for _ in range(K):
                o = ps.pallas_sample_displaced(
                    im, fx_, fy_, band=7, col_block=cb, row_block=rb
                )
                fx_ = fx_ + o.ravel()[0] * 1e-20
            return o

        bench(f"sample rb={rb} cb={cb} vmem={lim}", samp_k, img, fx, fy)

    # ---- multi-plane sampler at the z-stack shape ----
    imgs8 = jnp.asarray(rng.random((8, 4096, 4096)), jnp.float32)
    fx8 = jnp.asarray((rng.random((4096, 4096)) - 0.5) * 3, jnp.float32)
    fy8 = jnp.asarray((rng.random((4096, 4096)) - 0.5) * 3, jnp.float32)
    for rb in (16, 32):
        @jax.jit
        def multi_k(im, fx_, fy_, rb=rb):
            o = None
            for _ in range(K):
                o = ps.pallas_sample_displaced_multi(im, fx_, fy_, row_block=rb)
                fx_ = fx_ + o.ravel()[0] * 1e-20
            return o

        bench(f"sample_multi 8x4096^2 rb={rb} vmem={lim}", multi_k, imgs8, fx8, fy8)


if __name__ == "__main__":
    main()
