"""Per-stage on-chip timings for the feature registration path (config 1).

Measures DoG, tiled FAST+DAISY extraction, knn matching, RANSAC, the traced
affine warp, the MI gate pair, and the fused level program at the bench
geometry (4096², tile 1000, halo 51, k=5000/tile).  Run on the real TPU:

    python scripts/profile_feature.py
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

SIZE = 4096
TILE = 1000
K_REP = 2


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    print(f"{name:38s} {min(times)*1e3:8.2f} ms", flush=True)
    return out


def main():
    import cv2 as cv

    from microaligner_tpu.features.registrator import _level_align_fused
    from microaligner_tpu.features.tile_features import _HALO, _find_features_tiled_jit
    from microaligner_tpu.features.match import match_descriptors
    from microaligner_tpu.features.ransac import _NUM_HYPOTHESES, _ransac_core
    from microaligner_tpu.ops.affine_tiled import affine_warp_traced
    from microaligner_tpu.ops.filters import dog_traced
    from microaligner_tpu.ops.mutual_info import mi_tiled_traced
    from microaligner_tpu.parallel.tile_runner import current_tile_mesh
    from microaligner_tpu.tiles import TileGrid

    rng = np.random.default_rng(1)
    base = cv.GaussianBlur(rng.random((SIZE, SIZE), dtype=np.float32), (0, 0), 3.0)
    ref = cv.normalize(base, None, 0, 255, cv.NORM_MINMAX, cv.CV_8U)
    t_true = np.float32([[1.0004, 0.0003, 6.4], [-0.0003, 1.0004, -9.1]])
    mov = cv.warpAffine(ref, t_true, (SIZE, SIZE))

    grid = TileGrid.for_image((SIZE, SIZE), TILE, _HALO)
    k = min(1_000_000 // grid.num_tiles, 5000)
    mesh = current_tile_mesh()
    refj = jnp.asarray(ref)
    movj = jnp.asarray(mov)

    dogd = jax.jit(lambda x: dog_traced(x, True))
    ref_dog = timed("dog (4096²)", dogd, refj)

    find = jax.jit(
        lambda x: _find_features_tiled_jit(x, grid, k, mesh),
    )
    rc, rd, rv, rr = timed("find (FAST+DAISY, 25 tiles, k=5000)", find, ref_dog)
    mc, md, mv, mr = find(dogd(movj))
    jax.block_until_ready(mc)

    match = jax.jit(match_descriptors)
    good, ref_idx = timed("knn match (125k x 125k x 200)", match, rd, md, rv, mv)

    dst = jnp.take(rc, ref_idx, axis=0)
    ransac = jax.jit(lambda s, d, g: _ransac_core(s, d, g, jax.random.PRNGKey(0), _NUM_HYPOTHESES))
    timed("ransac (2048 hyp)", ransac, mc.astype(jnp.float32), dst.astype(jnp.float32), good)

    fwd = jnp.asarray(t_true)
    warp = jax.jit(lambda im, m: affine_warp_traced(im.astype(jnp.float32), m))
    timed("affine_warp_traced (4096²)", warp, movj, fwd)

    gate = jax.jit(lambda a, b: mi_tiled_traced(dog_traced(a, True), dog_traced(b, True), TILE))
    timed("MI gate (one pair)", gate, refj, movj)

    fused = lambda: _level_align_fused(
        refj, rc, rd, rv, movj, grid, k, TILE, 3, True, mesh, "uint8"
    )
    timed("FUSED level (3 iters)", lambda: fused()[0])


if __name__ == "__main__":
    main()
