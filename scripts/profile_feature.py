"""Stage-level wall profile of FeatureRegistrator.register() at 4096^2.

Times (on real hardware, post-compile):
  - mov pyramid build
  - ref feature extraction per level (find_features host path)
  - per-level fused align (_level_align_fused), split into launch+sync
Run: python scripts/profile_feature.py [size]
"""
import os
import sys
import time

os.environ.setdefault("MICROALIGNER_TPU_LOG", "quiet")

import jax
import jax.numpy as jnp
import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from microaligner_tpu.features.registrator import FeatureRegistrator, _level_align_fused
from microaligner_tpu.features.tile_features import _HALO, find_features
from microaligner_tpu.ops.filters import dog as _dog
from microaligner_tpu.parallel.tile_runner import current_tile_mesh
from microaligner_tpu.tiles import TileGrid


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rng = np.random.default_rng(1)
    base = rng.integers(0, 255, (size, size), np.uint8)
    # smooth it a bit so FAST finds structured corners
    img = np.asarray(jax.device_get(
        jnp.clip(jnp.asarray(base, jnp.float32), 0, 255)
    )).astype(np.uint8)
    ref = img
    mov = np.roll(img, (7, -9), axis=(0, 1))

    reg = FeatureRegistrator()
    reg.ref_img = ref
    reg.mov_img = mov

    def t(fn, label, n=2):
        fn()  # warm
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            r = fn()
            jax.block_until_ready(jax.tree_util.tree_leaves(r) or [jnp.zeros(())])
            best = min(best, time.perf_counter() - t0)
        print(f"{label:45s} {best*1e3:9.1f} ms")
        return r

    # full register for the headline
    def full():
        reg2 = FeatureRegistrator()
        reg2.ref_img = ref
        reg2.mov_img = mov
        return reg2.register()

    t0 = time.perf_counter()
    full()
    print(f"{'register() cold-ish (cache-warm compile)':45s} {(time.perf_counter()-t0)*1e3:9.1f} ms")
    t0 = time.perf_counter()
    full()
    print(f"{'register() steady':45s} {(time.perf_counter()-t0)*1e3:9.1f} ms")

    # stages
    pyr, factors = t(lambda: reg._generate_img_pyr(mov), "mov pyramid build")
    print("factors", factors, "shapes", [p.shape for p in pyr])

    for i, (lvl, factor) in enumerate(zip(pyr, factors)):
        t(lambda lvl=lvl: jax.block_until_ready(
            find_features(_dog(lvl, True), reg.tile_size).descriptors),
          f"ref find_features lvl{i} {lvl.shape}")

    mesh = current_tile_mesh()
    ref_pyr, _ = reg._generate_img_pyr(ref)
    feats = [find_features(_dog(l, True), reg.tile_size) for l in ref_pyr]
    for i, (lvl, f) in enumerate(zip(pyr, feats)):
        grid = TileGrid.for_image(tuple(lvl.shape), reg.tile_size, _HALO)
        k = min(1_000_000 // grid.num_tiles, 5000)
        lvl_dev = jnp.asarray(lvl)
        rl = jnp.asarray(ref_pyr[i])
        t(lambda rl=rl, f=f, lvl_dev=lvl_dev, grid=grid, k=k: _level_align_fused(
            rl, f.coords, f.descriptors, f.valid, lvl_dev,
            grid, k, reg.tile_size, reg.num_iterations, reg.use_dog,
            mesh, lvl_dev.dtype.name),
          f"fused align lvl{i} {lvl.shape} tiles={grid.num_tiles} k={k}")

    # sub-stage split at the finest level: detection+description vs matching
    # vs RANSAC (attributes the fused-align time; each jitted alone)
    from microaligner_tpu.features.match import match_descriptors
    from microaligner_tpu.features.ransac import estimate_affine_partial_2d

    lvl = pyr[-1]
    f_ref = feats[-1]
    mov_f = find_features(_dog(lvl, True), reg.tile_size)
    t(lambda: jax.block_until_ready(
        find_features(_dog(lvl, True), reg.tile_size).descriptors),
      f"  find_features (mov, finest {lvl.shape})")
    t(lambda: match_descriptors(
        f_ref.descriptors, mov_f.descriptors, f_ref.valid, mov_f.valid),
      f"  match_descriptors ({f_ref.descriptors.shape[0]} x {mov_f.descriptors.shape[0]})")
    good, ridx = match_descriptors(
        f_ref.descriptors, mov_f.descriptors, f_ref.valid, mov_f.valid)
    dst = jnp.take(f_ref.coords, ridx, axis=0)
    t(lambda: estimate_affine_partial_2d(
        mov_f.coords, dst, valid=good, nvalid_hint=int(jnp.sum(good))),
      "  ransac fit")


if __name__ == "__main__":
    main()
