"""Bisect the 4296-wide dense-band TPU compile crash.

Calls the Farneback core directly at band slab shapes, toggling the Pallas
kernel gates, to find (a) which kernel crashes the remote compiler and
(b) the width threshold.

  python scripts/probe_dense_compile.py --widths 2248,3072,4296 --hs 1224
  python scripts/probe_dense_compile.py --no-agg --widths 4296 --hs 1224
"""
import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="2248,3072,4296")
    ap.add_argument("--hs", default="1224")
    ap.add_argument("--win", type=int, default=99)
    ap.add_argument("--no-agg", action="store_true")
    ap.add_argument("--no-matrices", action="store_true")
    ap.add_argument("--full-error", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import importlib

    fb = importlib.import_module("microaligner_tpu.optflow.farneback")

    if args.no_agg:
        fb._PALLAS_AGG_OK = False
    if args.no_matrices:
        fb._PALLAS_MATRICES_OK = False

    rng = np.random.default_rng(0)

    for h in [int(x) for x in args.hs.split(",")]:
        for w in [int(x) for x in args.widths.split(",")]:
            a = jnp.asarray(rng.random((1, h, w)), jnp.float32)
            b = jnp.roll(a, 2, axis=2)

            @jax.jit
            def run(x, y):
                fx, fy = fb._farneback_core_parts(x, y, args.win, 3, 1, 1.7)
                return fx.sum() + fy.sum()

            t0 = time.perf_counter()
            try:
                v = float(run(a, b))
                dt = time.perf_counter() - t0
                times = []
                for _ in range(2):
                    t1 = time.perf_counter()
                    jax.block_until_ready(run(a, b))
                    times.append(time.perf_counter() - t1)
                print(f"h={h} w={w}: OK compile {dt:5.1f}s steady "
                      f"{min(times)*1e3:7.1f} ms (sum {v:.3g})", flush=True)
            except Exception as e:
                if args.full_error:
                    traceback.print_exc()
                print(f"h={h} w={w}: FAIL {repr(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
