"""On-hardware stage profile of the 20k tiled register path (bench config 5).

Bench config 2 (4096^2) runs the same per-tile Farneback at ~1.0 Gpix/s of
window pixels; config 5 (20480^2, 441 tiles) measured ~205 Mpix/s.  This
script splits the 20k path into stages and sweeps the likely causes so the
regression can be attributed on real hardware:

  * tile batch size (bounded lax.map chunking),
  * window extraction (dynamic_slice from the 20k canvas) vs pre-extracted
    static stacks,
  * the Farneback core itself at 20k tile counts,
  * stitch + stack,
  * the separate warp pass vs the fused flow+warp chunk,
  * a 4096^2 run of the SAME code path as the apples-to-apples anchor.

Run:  python scripts/profile_20k.py [--size 20480] [--reps 2]
Needs the TPU tunnel up; each first compile is slow (cached afterwards).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_pair(size: int, seed: int = 4):
    """Same construction as bench.bench_20k: a textured u8 pair."""
    import cv2 as cv

    rng = np.random.default_rng(seed)
    base = size // 8
    img = cv.GaussianBlur(rng.random((base, base), dtype=np.float32), (0, 0), 2.5)
    img = cv.normalize(img, None, 0, 255, cv.NORM_MINMAX, cv.CV_8U)
    ys, xs = np.mgrid[0:base, 0:base].astype(np.float32)
    mov = cv.remap(img, xs + 1.3, ys - 0.8, cv.INTER_LINEAR)
    ref = np.tile(img, (8, 8))[:size, :size]
    mov = np.tile(mov, (8, 8))[:size, :size]
    return ref, mov


def timed(label, fn, reps=2):
    import jax

    fn()  # compile + settle
    best = min(_time_one(fn) for _ in range(reps))
    print(f"{label:<58s} {best*1e3:9.1f} ms")
    return best


def _time_one(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=20480)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--tile", type=int, default=1000)
    ap.add_argument("--overlap", type=int, default=100)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batches", type=str, default="8,16,28")
    ap.add_argument("--skip-static", action="store_true",
                    help="skip the static-split stage (OOMs at 20k: 17.2G HBM)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from microaligner_tpu.optflow import flow_calc as fc
    from microaligner_tpu.optflow.farneback import _farneback_core_parts
    from microaligner_tpu.optflow.flow_calc import (
        calc_flow_and_warp_tiled,
        calc_flow_tiled,
    )
    from microaligner_tpu.optflow.warper import warp_tiled_dtype
    from microaligner_tpu.tiles import (
        TileGrid,
        pad_canvas,
        split_into_tiles,
        stitch_interiors,
        tile_origins,
    )

    size = args.size
    win_size = args.overlap - (1 - args.overlap % 2)
    grid = TileGrid.for_image((size, size), args.tile, args.overlap)
    n_tiles = grid.num_tiles
    win_h, win_w = grid.tile_shape
    win_mpix = n_tiles * win_h * win_w / 1e6
    print(f"image {size}^2  tiles {grid.ny}x{grid.nx}={n_tiles}  window {win_h}x{win_w}"
          f"  window-pixels {win_mpix:.0f} Mpix  win_size {win_size}  iters {args.iters}")
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    ref, mov = make_pair(size)

    t0 = time.perf_counter()
    refj = jax.device_put(jnp.asarray(ref))
    movj = jax.device_put(jnp.asarray(mov))
    jax.block_until_ready((refj, movj))
    print(f"{'upload 2x u8 planes':<58s} {(time.perf_counter()-t0)*1e3:9.1f} ms")

    def sync(x):
        jax.block_until_ready(x)

    results = {}

    # -- full path at several tile batch sizes ------------------------------
    for b in [int(x) for x in args.batches.split(",")]:
        os.environ["MICROALIGNER_TPU_FLOW_TILE_BATCH"] = str(b)
        t = timed(
            f"calc_flow_tiled (batch={b})",
            lambda: sync(calc_flow_tiled(refj, movj, grid, win_size, args.iters)),
            args.reps,
        )
        results[f"flow_b{b}"] = t
    os.environ.pop("MICROALIGNER_TPU_FLOW_TILE_BATCH", None)

    # -- static window extraction (materialized halo stacks) -----------------
    if not args.skip_static:
        os.environ["MICROALIGNER_TPU_FLOW_STATIC_SPLIT"] = "1"
        results["flow_static"] = timed(
            "calc_flow_tiled (static split, default batch)",
            lambda: sync(calc_flow_tiled(refj, movj, grid, win_size, args.iters)),
            args.reps,
        )
        os.environ.pop("MICROALIGNER_TPU_FLOW_STATIC_SPLIT", None)

    # -- fused flow+warp vs flow-then-warp ----------------------------------
    results["fused_flow_warp"] = timed(
        "calc_flow_and_warp_tiled (default batch)",
        lambda: sync(calc_flow_and_warp_tiled(
            refj, movj, movj, grid, win_size, args.iters, "uint8")),
        args.reps,
    )
    flow = calc_flow_tiled(refj, movj, grid, win_size, args.iters)
    sync(flow)
    results["warp_pass"] = timed(
        "warp_tiled_dtype (separate warp pass)",
        lambda: sync(warp_tiled_dtype(movj, flow, grid, "uint8")),
        args.reps,
    )

    # -- window extraction alone --------------------------------------------
    origins = jnp.asarray(tile_origins(grid))
    batch = 16

    @jax.jit
    def extract_only(canvas, orig):
        n = orig.shape[0]
        pad = (-n) % batch
        orig_p = jnp.concatenate([orig, jnp.zeros((pad, 2), orig.dtype)])
        chunked = orig_p.reshape(-1, batch, 2)

        def chunk(o):
            wins = jax.lax.map(
                lambda p: jax.lax.dynamic_slice(canvas, (p[0], p[1]), (win_h, win_w)),
                o,
            )
            # cheap per-chunk reduction so the windows are actually produced
            return jnp.sum(wins.astype(jnp.float32), axis=(1, 2))

        return jnp.sum(jax.lax.map(chunk, chunked))

    canvas_r = jax.jit(lambda x: pad_canvas(x, grid), static_argnums=())(refj)
    sync(canvas_r)
    results["extract"] = timed(
        f"window extraction only (dyn-slice, {n_tiles} windows)",
        lambda: sync(extract_only(canvas_r, origins)),
        args.reps,
    )

    # -- farneback core on pre-extracted static stacks ----------------------
    # u8 stacks: (N, win, win) -- 441 * 1.44 MB ~= 0.64 GB each at 20k
    ref_stack = split_into_tiles(refj, grid)
    mov_stack = split_into_tiles(movj, grid)
    jax.block_until_ready((ref_stack, mov_stack))

    @functools.partial(jax.jit, static_argnames=("b",))
    def farneback_stack(rs, ms, b):
        n = rs.shape[0]
        pad = (-n) % b
        z = jnp.zeros((pad,) + rs.shape[1:], rs.dtype)
        rs = jnp.concatenate([rs, z]).reshape(-1, b, win_h, win_w)
        ms = jnp.concatenate([ms, z]).reshape(-1, b, win_h, win_w)

        def chunk(args_):
            r, m = args_
            fx, fy = _farneback_core_parts(
                m.astype(jnp.float32), r.astype(jnp.float32),
                win_size, args.iters, 1, 1.7,
            )
            o = grid.overlap
            return (
                fx[:, o : o + grid.tile_h, o : o + grid.tile_w],
                fy[:, o : o + grid.tile_h, o : o + grid.tile_w],
            )

        fx, fy = jax.lax.map(chunk, (rs, ms))
        return fx.reshape((-1,) + fx.shape[2:]), fy.reshape((-1,) + fy.shape[2:])

    results["farneback_prestack"] = timed(
        "farneback core on pre-extracted stacks (batch=16)",
        lambda: sync(farneback_stack(ref_stack, mov_stack, 16)),
        args.reps,
    )

    # -- stitch + stack alone ------------------------------------------------
    fx_dummy = jnp.zeros((n_tiles, grid.tile_h, grid.tile_w), jnp.float32) + 0.5
    sync(fx_dummy)

    @jax.jit
    def stitch_stack(fx, fy):
        return jnp.stack(
            [stitch_interiors(fx, grid), stitch_interiors(fy, grid)], axis=-1
        )

    results["stitch"] = timed(
        "stitch_interiors x2 + stack",
        lambda: sync(stitch_stack(fx_dummy, fx_dummy)),
        args.reps,
    )

    # -- 4096^2 anchor: the SAME code path at config-2 scale ------------------
    # config 2's bench number comes from make_sharded_register_step (static
    # split, no chunking); this anchor runs calc_flow_tiled itself at 4096 so
    # the per-window-pixel rate comparison is apples-to-apples.
    if size != 4096:
        a_grid = TileGrid.for_image((4096, 4096), args.tile, args.overlap)
        a_ref, a_mov = make_pair(4096)
        a_refj = jax.device_put(jnp.asarray(a_ref))
        a_movj = jax.device_put(jnp.asarray(a_mov))
        jax.block_until_ready((a_refj, a_movj))
        results["anchor4096"] = timed(
            "calc_flow_tiled @4096 (same path, default batch)",
            lambda: sync(calc_flow_tiled(a_refj, a_movj, a_grid, win_size, args.iters)),
            args.reps,
        )
        a_mpix = a_grid.num_tiles * win_h * win_w / 1e6
        print(f"  anchor window throughput @4096:    "
              f"{a_mpix / results['anchor4096']:8.0f} Mpix/s")

    # -- derived numbers -----------------------------------------------------
    best_flow = min(v for k, v in results.items() if k.startswith("flow_b"))
    print("\nderived:")
    print(f"  window throughput, full path:      {win_mpix / best_flow:8.0f} Mpix/s")
    print(f"  window throughput, prestack core:  {win_mpix / results['farneback_prestack']:8.0f} Mpix/s")
    print(f"  extraction share of full path:     {results['extract'] / best_flow * 100:5.1f} %")
    print(f"  stitch share of full path:         {results['stitch'] / best_flow * 100:5.1f} %")
    print(f"  fused flow+warp vs flow+warp-pass: {results['fused_flow_warp']:.3f} s vs "
          f"{best_flow + results['warp_pass']:.3f} s")


if __name__ == "__main__":
    main()
