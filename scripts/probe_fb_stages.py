"""Per-stage device timing of the Farneback core at a given batch geometry.

Each stage is chained K times inside ONE jit (carry-dependent, so XLA can't
dead-code or overlap the repeats) — per-launch tunnel overhead (25-70 ms)
otherwise swamps the stage cost.  Compares batch geometries, e.g. the tiled
window batch vs a full-width dense band:

  python scripts/probe_fb_stages.py --geom 16,1200,1200 --geom 1,1224,4296
"""
import argparse
import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geom", action="append", default=[])
    ap.add_argument("--win", type=int, default=99)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    geoms = [tuple(int(x) for x in g.split(",")) for g in args.geom] or [
        (16, 1200, 1200), (1, 1224, 4296)
    ]

    import jax
    import jax.numpy as jnp

    fb = importlib.import_module("microaligner_tpu.optflow.farneback")
    rng = np.random.default_rng(0)
    K = args.k

    def bench(fn, *xs):
        out = fn(*xs)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*xs))
            best = min(best, time.perf_counter() - t0)
        return best, out

    for (n, h, w) in geoms:
        mpix = n * h * w / 1e6
        mov = jnp.asarray(rng.random((n, h, w)) * 255, jnp.float32)
        ref = jnp.roll(mov, 2, axis=2)
        win = args.win

        # chain via a tiny input perturbation that depends on the previous
        # iteration's output scalar — forces sequential execution
        @jax.jit
        def pair_k(a, b):
            s = jnp.float32(0)
            outs = None
            for _ in range(K):
                outs = fb._poly_pair_m_pallas(a + s, b, 1, 1.7, win)
                s = outs[2].ravel()[0].astype(jnp.float32) * 1e-20
            return outs

        @jax.jit
        def solve_k(m):
            fx = fy = None
            for _ in range(K):
                fx, fy = fb._update_flow_gaussian_cf(m, win)
                m = m + (fx.ravel()[0] * 1e-20).astype(m.dtype)
            return fx, fy

        @jax.jit
        def update_k(r0, r1, fx, fy):
            m = None
            for _ in range(K):
                m = fb._update_matrices_batched_cf(r0, r1, fx, fy, win)
                fx = fx + m[:, 0].ravel()[0].astype(jnp.float32) * 1e-20
            return m

        t_pair, (r0, r1, m0) = bench(pair_k, mov, ref)
        t_solve, (fx, fy) = bench(solve_k, m0)
        t_upd, _ = bench(update_k, r0, r1, fx, fy)
        t_full, _ = bench(
            jax.jit(lambda a, b: fb._farneback_core_parts(a, b, win, 3, 1, 1.7)),
            mov, ref,
        )
        pair, solve, upd = t_pair / K, t_solve / K, t_upd / K
        model = pair + 3 * solve + 2 * upd
        print(
            f"geom {n}x{h}x{w} ({mpix:.1f} Mpix): pair {pair*1e3:7.1f} ms | "
            f"solve {solve*1e3:7.1f} ms | update {upd*1e3:7.1f} ms | "
            f"full(3it) {t_full*1e3:7.1f} ms (model {model*1e3:7.1f}) | "
            f"{mpix/t_full:6.1f} Mpix/s", flush=True,
        )


if __name__ == "__main__":
    main()
