"""On-hardware stage attribution for bench config 3 (chained 2-lvl 2048²).

The whole-register program runs at ~0.41 s device (BENCH config 3) while the
raw Farneback work it contains would cost ~15-20 ms at config 2's measured
rate — so ~95% of the time is in the surrounding stages.  This script times
each stage of `_fused_level_carry` separately (K-chained inside one jit so
per-launch tunnel overhead amortizes):

  * DoG preprocessing at each level size
  * whole-image Farneback 1024² and dense-banded 2048² (win 99 ×3)
  * warp_tiled_dtype (pre-warp + post-warp)
  * mi_tiled_traced (the NMI gate — two per level)
  * compose_flows_tiled at 2048²
  * pyr_down / pyr_up plumbing

Run on the tunnel:  python scripts/probe_cfg3_stages.py [--k 4] [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--size", type=int, default=2048)
    args = ap.parse_args()
    K = args.k

    import jax
    import jax.numpy as jnp

    from microaligner_tpu.ops.filters import dog_traced, pyr_down, pyr_up
    from microaligner_tpu.ops.mutual_info import mi_tiled_traced
    from microaligner_tpu.optflow.farneback import _farneback_core_parts
    from microaligner_tpu.optflow.flow_calc import calc_flow_and_warp_dense_banded
    from microaligner_tpu.optflow.warper import compose_flows_tiled, warp_tiled_dtype
    from microaligner_tpu.tiles import TileGrid

    size = args.size
    half = size // 2
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((size, size)) * 255, jnp.float32)
    img_h = jnp.asarray(rng.random((half, half)) * 255, jnp.float32)
    flow = jnp.asarray(rng.standard_normal((size, size, 2)) * 1.5, jnp.float32)
    flow_h = jnp.asarray(rng.standard_normal((half, half, 2)) * 1.5, jnp.float32)
    grid = TileGrid.for_image((size, size), 1000, 100)
    grid_h = TileGrid.for_image((half, half), 1000, 100)
    win = 99

    def timed(label, make_fn):
        """make_fn() -> a jitted callable taking a scalar seed; K-chained."""
        fn = make_fn()

        @jax.jit
        def rep(s0):
            s = s0
            for _ in range(K):
                s = fn(s)
            return s

        float(rep(jnp.float32(0.1)))  # compile
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(rep(jnp.float32(0.2)))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:42s} {best / K * 1e3:9.1f} ms/step")

    # each stage consumes the carry scalar so the chain is sequential
    timed("dog 2048", lambda: lambda s: jnp.sum(
        dog_traced(img + s, True)[:2, :2]))
    timed("dog 1024", lambda: lambda s: jnp.sum(
        dog_traced(img_h + s, True)[:2, :2]))
    timed("farneback whole 1024 win99 x3", lambda: lambda s: jnp.sum(
        _farneback_core_parts((img_h + s)[None], img_h[None], win, 3, 1, 1.7)[0][:, :2, :2]))
    timed("farneback dense 2048 win99 x3 (+warp)", lambda: lambda s: jnp.sum(
        calc_flow_and_warp_dense_banded(
            img, img + s, img, grid, win, 3, "float32")[1][:2, :2]))
    timed("warp_tiled 2048 f32", lambda: lambda s: jnp.sum(
        warp_tiled_dtype(img + s, flow, grid, "float32")[:2, :2]))
    timed("warp_tiled 1024 f32", lambda: lambda s: jnp.sum(
        warp_tiled_dtype(img_h + s, flow_h, grid_h, "float32")[:2, :2]))
    timed("mi_tiled 2048 (one gate call)", lambda: lambda s: jnp.sum(
        mi_tiled_traced(img, img + s, 1000)))
    timed("mi_tiled 1024", lambda: lambda s: jnp.sum(
        mi_tiled_traced(img_h, img_h + s, 1000)))
    timed("compose_flows_tiled 2048", lambda: lambda s: jnp.sum(
        compose_flows_tiled(flow + s, flow, grid)[:2, :2, 0]))
    timed("pyr_down 2048", lambda: lambda s: jnp.sum(
        pyr_down(img + s)[:2, :2]))
    timed("pyr_up flow 1024->2048", lambda: lambda s: jnp.sum(
        pyr_up(flow_h + s, (size, size))[:2, :2, 0]))


if __name__ == "__main__":
    main()
