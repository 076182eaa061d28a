"""Attribute config-5's first_call_s: trace+lower vs compile (persistent-cache
hit) vs first execution on the tunneled device.

Run fresh:  python scripts/probe_first_call.py [size]
"""
from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("MICROALIGNER_TPU_LOG", "quiet")

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 20480
    tile_size, overlap, num_iter = 1000, 100, 3
    win_size = overlap - (1 - overlap % 2)

    from microaligner_tpu.optflow.flow_calc import (
        _band_rows,
        _calc_flow_and_warp_dense_banded,
    )
    from microaligner_tpu.parallel.tile_runner import current_tile_mesh
    from microaligner_tpu.tiles import TileGrid

    rng = np.random.default_rng(4)
    ref = rng.integers(0, 255, (size, size), np.uint8)
    mov = np.roll(ref, (3, -5), axis=(0, 1))
    grid = TileGrid.for_image(ref.shape, tile_size, overlap)

    t0 = time.perf_counter()
    refj = jnp.asarray(ref)
    movj = jnp.asarray(mov)
    jax.block_until_ready((refj, movj))
    t_upload = time.perf_counter() - t0
    print(f"upload 2x{size}^2 u8: {t_upload:.2f}s", flush=True)

    kw = dict(
        grid=grid, win_size=win_size, num_iter=num_iter,
        out_dtype_name="uint8", band_rows=_band_rows(grid),
        mesh=current_tile_mesh(),
    )
    t0 = time.perf_counter()
    lowered = _calc_flow_and_warp_dense_banded.lower(refj, movj, movj, **kw)
    t_lower = time.perf_counter() - t0
    print(f"trace+lower: {t_lower:.2f}s", flush=True)

    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"compile (cache {'hit' if t_compile < 30 else 'MISS?'}): "
          f"{t_compile:.2f}s", flush=True)

    t0 = time.perf_counter()
    flow, warped = compiled(refj, movj, movj)
    float(jnp.sum(warped.astype(jnp.float32)[0, :8]))
    t_first = time.perf_counter() - t0
    print(f"first exec: {t_first:.2f}s", flush=True)

    t0 = time.perf_counter()
    flow, warped = compiled(refj, movj, movj)
    float(jnp.sum(warped.astype(jnp.float32)[0, :8]))
    print(f"second exec: {time.perf_counter() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
