"""Probe: which dense-band heights compile on hardware, and how fast.

The 2026-08-18 dense A/B found the 4096-pair single-band program (slab
4296x4296) crashes the TPU remote compiler while the 2048-pair parity
slab (2248 wide) passes.  This sweeps MICROALIGNER_TPU_FLOW_BAND_ROWS at
the config-2 geometry to find the compile-safe / fastest band height.

  python scripts/probe_band_rows.py [--size 4096] [--rows 512,1024,2048,4096]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--rows", default="1024,2048,4096")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from microaligner_tpu.optflow.flow_calc import calc_flow_and_warp_dense_banded
    from microaligner_tpu.tiles import TileGrid

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (args.size, args.size), np.uint8)
    import cv2 as cv

    ref = cv.GaussianBlur(base, (0, 0), 3)
    mov = np.roll(ref, (2, -3), (0, 1))
    grid = TileGrid.for_image(ref.shape, 1000, 100)
    refd, movd = jnp.asarray(ref), jnp.asarray(mov)

    for rows in [int(r) for r in args.rows.split(",")]:
        os.environ["MICROALIGNER_TPU_FLOW_BAND_ROWS"] = str(rows)
        t0 = time.perf_counter()
        try:
            flow, warped = calc_flow_and_warp_dense_banded(
                refd, movd, movd, grid, 99, args.iters, "uint8"
            )
            jax.block_until_ready((flow, warped))
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                flow, warped = calc_flow_and_warp_dense_banded(
                    refd, movd, movd, grid, 99, args.iters, "uint8"
                )
                jax.block_until_ready((flow, warped))
                times.append(time.perf_counter() - t0)
            print(
                f"rows={rows:5d}: OK compile {compile_s:6.1f}s "
                f"steady {min(times)*1e3:8.1f} ms", flush=True,
            )
        except Exception as e:
            print(f"rows={rows:5d}: FAIL {repr(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
