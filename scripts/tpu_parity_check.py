"""On-hardware parity check: fused TPU register step vs OpenCV.

The CPU test suite runs f32 XLA everywhere, so it cannot see TPU-only
behavior: MXU bf16-pass precision (HIGH vs HIGHEST) and the Mosaic kernels.
This script runs the bench-shaped tiled Farneback register step on the real
TPU and compares flow and warped output against cv2.calcOpticalFlowFarneback
+ cv2.remap per tile (the reference compute at optflow_reg/flow_calc.py and
warper.py), using the same bars as tests/test_farneback.py: flow mean abs
diff < 1e-3 px, max < 0.05 px; warped-plane MSE < 1e-3 (BASELINE.md target).

Run:  python scripts/tpu_parity_check.py [size]
      python scripts/tpu_parity_check.py --sweep     # winsize/size matrix
      python scripts/tpu_parity_check.py --feature   # bf16 feature path vs f32

The sweep mode exists because the DEFAULT (single-pass bf16) aggregation
precision was originally validated at one point (2048² win99): the
same-sign-cancellation argument weakens for small winsize, so the sweep
re-checks the parity bars across winsize x size x iters (ADVICE round 2).

bf16 R0/R1 storage (farneback._r_storage_dtype) is validated the same way:
``MICROALIGNER_TPU_R_BF16=1 python scripts/tpu_parity_check.py --sweep``
must be all-PASS on hardware before flipping that knob's default on.
"""

from __future__ import annotations

import os
import sys

# env vars set in-process are ignored by this jax build; use the config API
import jax as _jax

_jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    ),
)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
if "--cpu" in sys.argv:
    # CPU smoke mode: the JAX_PLATFORMS env var is IGNORED by this jax build
    # (axon stays pinned and device init hangs when the tunnel is down); the
    # config API is the only reliable platform override (see tests/conftest).
    _jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _sweep() -> int:
    """Whole-image Farneback vs cv2 across winsize x size x iters.

    Uses the same bars as the tiled check.  Small winsizes are the cases the
    bf16 same-sign-cancellation argument covers least, so they lead.
    """
    import cv2 as cv
    import jax
    import jax.numpy as jnp

    from microaligner_tpu.optflow.farneback import farneback

    combos = [
        # (size, winsize, iters) — small windows first (ADVICE round 2)
        (256, 11, 3),
        (512, 21, 3),
        (512, 31, 1),
        (1024, 51, 3),
        (1024, 75, 2),
        (2048, 99, 3),
    ]
    all_ok = True
    for size, win, it in combos:
        rng = np.random.default_rng(size + win)
        base = cv.GaussianBlur(rng.random((size, size), dtype=np.float32), (0, 0), 3.0)
        base = cv.normalize(base, None, 0, 255, cv.NORM_MINMAX, cv.CV_8U)
        ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
        mov = cv.remap(
            base, xs + 2.0 * np.sin(ys / 50), ys + 1.5 * np.cos(xs / 45), cv.INTER_LINEAR
        )
        f_t = np.asarray(
            farneback(
                jnp.asarray(mov, jnp.float32), jnp.asarray(base, jnp.float32),
                win_size=win, num_iter=it,
            )
        )
        f_cv = cv.calcOpticalFlowFarneback(
            mov, base, None, 0.5, 0, win, it, 1, 1.7, cv.OPTFLOW_FARNEBACK_GAUSSIAN
        )
        fd = np.abs(f_t - f_cv)
        nf = -f_cv.copy()
        nf[..., 0] += np.arange(size)
        nf[..., 1] += np.arange(size).reshape(-1, 1)
        w_cv = cv.remap(mov.astype(np.float32), nf, None, cv.INTER_LINEAR)
        nt = -f_t.copy()
        nt[..., 0] += np.arange(size)
        nt[..., 1] += np.arange(size).reshape(-1, 1)
        w_t = cv.remap(mov.astype(np.float32), nt, None, cv.INTER_LINEAR)
        mse = float(((w_t - w_cv) ** 2).mean()) / 255.0**2
        ok = fd.mean() < 1e-3 and fd.max() < 0.05 and mse < 1e-3
        all_ok &= ok
        print(
            f"size {size:5d} win {win:3d} iter {it}: flow mean {fd.mean():.2e} "
            f"max {fd.max():.4f} px, warped MSE {mse:.2e}  "
            f"{'PASS' if ok else 'FAIL'}"
        )
    print("SWEEP:", "PASS" if all_ok else "FAIL")
    return 0 if all_ok else 1


def _feature_child(out_path: str) -> int:
    """Child-process half of --feature: run the feature pipeline pieces with
    either production (bf16) or exact (f32) precision and save outputs.

    Subprocesses because the precision knobs are read at trace time and the
    jit cache would otherwise serve the first variant's program to both.
    """
    import cv2 as cv
    import jax
    import jax.numpy as jnp

    from microaligner_tpu.features import FeatureRegistrator
    from microaligner_tpu.features.tile_features import find_features
    from microaligner_tpu.features.match import knn_top2

    size = 1024
    rng = np.random.default_rng(11)
    base = cv.GaussianBlur(rng.random((size, size), dtype=np.float32), (0, 0), 3.0)
    ref = cv.normalize(base, None, 0, 255, cv.NORM_MINMAX, cv.CV_8U)
    t_true = np.float32([[1.0004, 0.0003, 6.4], [-0.0003, 1.0004, -9.1]])
    mov = cv.warpAffine(ref, t_true, (size, size))

    fr = find_features(ref, 1000)
    fm = find_features(mov, 1000)
    d1, d2, i1 = knn_top2(fm.descriptors, fr.descriptors, fm.valid, fr.valid)

    reg = FeatureRegistrator()
    reg.num_pyr_lvl = 2
    reg.num_iterations = 3
    reg.tile_size = 1000
    reg.use_dog = True
    reg.ref_img = ref
    reg.mov_img = mov
    tmat = reg.register()

    np.savez(
        out_path,
        desc=np.asarray(fr.descriptors),
        valid=np.asarray(fr.valid),
        d1=np.asarray(d1), d2=np.asarray(d2), i1=np.asarray(i1),
        tmat=np.asarray(tmat), t_true=t_true,
    )
    return 0


def _feature() -> int:
    """Production bf16 feature path vs exact f32 on hardware.

    Bars: descriptor max abs diff < 5e-3 (unit-normalized, bf16 argument in
    features/match.py), knn nearest-neighbor agreement > 99% on valid rows,
    both registers recover the known transform to < 0.5 px translation.
    """
    import subprocess
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        paths = {}
        for name, env in (
            ("prod", {}),
            ("exact", {"MICROALIGNER_TPU_DAISY_EXACT": "1",
                       "MICROALIGNER_TPU_MATCH_F32": "1"}),
        ):
            out = os.path.join(td, f"{name}.npz")
            e = dict(os.environ, **env)
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--feature-child", out],
                env=e, capture_output=True, text=True, timeout=1800,
            )
            if r.returncode != 0:
                print(r.stdout[-2000:], r.stderr[-2000:])
                return 1
            paths[name] = np.load(out)
        p, x = paths["prod"], paths["exact"]
        both_valid = p["valid"] & x["valid"]
        dd = np.abs(p["desc"] - x["desc"])[both_valid].max() if both_valid.any() else 0.0
        # raw top-1 agreement is the wrong bar on dense random-texture
        # descriptors (near-tie distances flip freely and are then DISCARDED
        # by the ratio test); compare only matches that pass Lowe 0.5 in both
        r2 = 0.5 * 0.5
        gp = (p["d1"] < r2 * p["d2"]) & both_valid
        gx = (x["d1"] < r2 * x["d2"]) & both_valid
        gboth = gp & gx
        agree = float((p["i1"][gboth] == x["i1"][gboth]).mean()) if gboth.any() else 1.0
        jacc = float(gboth.sum() / max((gp | gx).sum(), 1))
        ep = np.abs(p["tmat"][:, 2] + p["t_true"][:, 2]).sum()
        ex = np.abs(x["tmat"][:, 2] + x["t_true"][:, 2]).sum()
        print(f"descriptor max abs diff (both-valid): {dd:.2e}")
        print(f"good-match sets: jaccard {jacc:.4f}, i1 agreement on both-good {agree:.4f}")
        print(f"translation err: prod {ep:.3f} px, exact {ex:.3f} px")
        ok = dd < 5e-3 and agree > 0.99 and jacc > 0.9 and ep < 0.5 and ex < 0.5
        print("FEATURE PARITY:", "PASS" if ok else "FAIL")
        return 0 if ok else 1


def _dense() -> int:
    """On-hardware parity of the banded dense flow path (round 4).

    CPU tests pin its math; this validates the TPU lowering at full-width
    band geometry (W + 2*overlap lanes — the regime where Mosaic lane
    hazards would bite) and the band-seam behavior on the real chip:

    a) single band vs cv2 Farneback on the same zero-padded canvas
       (exact-semantics golden, strict bars);
    b) multi-band vs single band (seam deviations bounded);
    c) fused band warp vs cv2.remap with the banded flow.
    """
    import cv2 as cv
    import jax
    import jax.numpy as jnp

    from microaligner_tpu.optflow.flow_calc import (
        _calc_flow_and_warp_dense_banded,
        _calc_flow_dense_banded,
    )
    from microaligner_tpu.tiles import TileGrid

    args = [a for a in sys.argv[1:] if a.isdigit()]
    size = int(args[0]) if args else 2048
    overlap, num_iter = (100, 3) if size >= 1024 else (20, 2)
    win_size = overlap - (1 - overlap % 2)
    band = 512 if size >= 1024 else max(64, size // 4)
    rng = np.random.default_rng(0)
    base = cv.GaussianBlur(rng.random((size, size), dtype=np.float32), (0, 0), 3.0)
    base = cv.normalize(base, None, 0, 255, cv.NORM_MINMAX, cv.CV_8U)
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
    mov = cv.remap(base, xs + 2.0 * np.sin(ys / 50), ys + 1.5 * np.cos(xs / 45),
                   cv.INTER_LINEAR)
    grid = TileGrid.for_image(base.shape, 1000, overlap)
    refj, movj = jnp.asarray(base), jnp.asarray(mov)

    one = np.asarray(_calc_flow_dense_banded(
        refj, movj, grid, win_size, num_iter, band_rows=size))

    # (a) cv2 on the identical zero-padded canvas, interior cropped
    o = overlap
    pad_r = np.pad(base, o).astype(np.uint8)
    pad_m = np.pad(mov, o).astype(np.uint8)
    f_cv = cv.calcOpticalFlowFarneback(
        pad_m, pad_r, None, 0.5, 0, win_size, num_iter, 1, 1.7,
        cv.OPTFLOW_FARNEBACK_GAUSSIAN,
    )[o : o + size, o : o + size]
    fd = np.abs(one - f_cv)
    print(f"(a) single band vs cv2: mean {fd.mean():.2e} px, max {fd.max():.3f} px")
    ok_a = fd.mean() < 1e-3 and fd.max() < 0.05

    # (b) multi-band seam deviations
    many = np.asarray(_calc_flow_dense_banded(
        refj, movj, grid, win_size, num_iter, band_rows=band))
    bd = np.abs(many - one)
    print(f"(b) multi-band vs single: mean {bd.mean():.2e} px, max {bd.max():.3f} px")
    ok_b = bd.mean() < 2e-3 and bd.max() < 0.5

    # (c) fused band warp vs cv2.remap with the banded flow
    _, warped = _calc_flow_and_warp_dense_banded(
        refj, movj, movj, grid, win_size, num_iter, "uint8", band_rows=band)
    nf = -many.copy()
    nf[..., 0] += np.arange(size)
    nf[..., 1] += np.arange(size).reshape(-1, 1)
    w_cv = cv.remap(mov.astype(np.float32), nf, None, cv.INTER_LINEAR)
    mse = float(np.mean((np.asarray(warped).astype(np.float64) - w_cv) ** 2)) / 255.0**2
    print(f"(c) fused band warp MSE (unit range): {mse:.2e}")
    ok_c = mse < 1e-3

    ok = ok_a and ok_b and ok_c
    print("DENSE PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def main() -> int:
    import cv2 as cv
    import jax
    import jax.numpy as jnp

    from microaligner_tpu.parallel.mesh import get_tile_mesh
    from microaligner_tpu.parallel.step import make_sharded_register_step
    from microaligner_tpu.tiles import TileGrid, split_into_tiles

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    tile_size, overlap = 1000, 100
    win_size = overlap - (1 - overlap % 2)
    num_iter = 3

    rng = np.random.default_rng(0)
    base = cv.GaussianBlur(rng.random((size, size), dtype=np.float32), (0, 0), 3.0)
    base = cv.normalize(base, None, 0, 255, cv.NORM_MINMAX, cv.CV_8U)
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
    mov = cv.remap(base, xs + 2.0 * np.sin(ys / 50), ys + 1.5 * np.cos(xs / 45), cv.INTER_LINEAR)

    grid = TileGrid.for_image(base.shape, tile_size, overlap)
    step = make_sharded_register_step(
        get_tile_mesh(jax.devices()[:1]), grid, win_size=win_size, num_iter=num_iter, with_hist=False
    )
    warped_t, flow_t = step(jnp.asarray(base, jnp.float32), jnp.asarray(mov, jnp.float32))
    flow_t = np.asarray(flow_t)
    warped_t = np.asarray(warped_t)

    # reference: cv2 per halo tile, stitched the same way
    ref_tiles = np.asarray(split_into_tiles(jnp.asarray(base, jnp.float32), grid))
    mov_tiles = np.asarray(split_into_tiles(jnp.asarray(mov, jnp.float32), grid))
    o = grid.overlap
    flow_cv = np.zeros((size, size, 2), np.float32)
    warp_cv = np.zeros((size, size), np.float32)
    for i in range(ref_tiles.shape[0]):
        f = cv.calcOpticalFlowFarneback(
            mov_tiles[i].astype(np.uint8), ref_tiles[i].astype(np.uint8), None,
            0.5, 0, win_size, num_iter, 1, 1.7, cv.OPTFLOW_FARNEBACK_GAUSSIAN,
        )
        hh, ww = f.shape[:2]
        nf = -f.copy()
        nf[..., 0] += np.arange(ww)
        nf[..., 1] += np.arange(hh).reshape(-1, 1)
        w = cv.remap(mov_tiles[i], nf, None, cv.INTER_LINEAR)
        r, c = divmod(i, grid.nx)
        y0, x0 = r * grid.tile_h, c * grid.tile_w
        th = min(grid.tile_h, size - y0)
        tw = min(grid.tile_w, size - x0)
        flow_cv[y0 : y0 + th, x0 : x0 + tw] = f[o : o + th, o : o + tw]
        warp_cv[y0 : y0 + th, x0 : x0 + tw] = w[o : o + th, o : o + tw]

    fd = np.abs(flow_t - flow_cv)
    # cv2's remap quantizes coords to 1/32 px; exclude a 1-px frame per tile
    # edge where the quantized stencil can differ
    mean_fd = fd.mean()
    max_fd = fd.max()
    wm = (warped_t.astype(np.float64) - warp_cv) ** 2
    mse = wm.mean() / (255.0**2)  # normalized to unit range like BASELINE.md
    print(f"flow abs diff: mean {mean_fd:.2e} px, max {max_fd:.3f} px")
    print(f"warped MSE (unit range): {mse:.2e}")
    ok = mean_fd < 1e-3 and max_fd < 0.05 and mse < 1e-3
    print("PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    if "--feature-child" in sys.argv:
        sys.exit(_feature_child(sys.argv[sys.argv.index("--feature-child") + 1]))
    elif "--feature" in sys.argv:
        sys.exit(_feature())
    elif "--sweep" in sys.argv:
        sys.exit(_sweep())
    elif "--dense" in sys.argv:
        sys.exit(_dense())
    else:
        sys.exit(main())
