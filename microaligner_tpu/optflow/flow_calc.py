"""Tiled Farneback flow: a mesh-sharded tile axis instead of a dask pool.

Mirrors ``TileFlowCalc`` (optflow_reg/flow_calc.py:50-98): below two tiles the
flow is computed on the whole image; otherwise both images are split into
halo-expanded tiles, flow is computed per tile — the tile axis sharded across
the worker mesh, memory-bounded batches within each device — and tile
interiors are stitched.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from microaligner_tpu.optflow.farneback import farneback, _farneback_core_parts
from microaligner_tpu.parallel.tile_runner import current_tile_mesh, tile_map
from microaligner_tpu.tiles import (
    TileGrid,
    pad_canvas,
    split_into_tiles,
    stitch_interiors,
    tile_origins,
)

__all__ = [
    "TileFlowCalc",
    "calc_flow_tiled",
    "calc_flow_and_warp_tiled",
    "calc_flow_dense_banded",
    "calc_flow_and_warp_dense_banded",
]


_TILE_BATCH = 8  # bounds live tile working set (R0/R1 are 5-channel planes).
# 2026-08-18 on-hardware A/B at 20480^2 (441 tiles): batch 8 -> 1.58 s
# register, batch 16 -> 1.75 s, batch 32 -> HBM OOM; smaller chunks keep the
# working set out of allocator pressure without losing amortization.


def _tile_batch() -> int:
    """Per-chunk tile count for the bounded Farneback map; env-tunable so the
    profiler can sweep it (it is a static jit arg — changes re-trace)."""
    return int(os.environ.get("MICROALIGNER_TPU_FLOW_TILE_BATCH", _TILE_BATCH))


def _static_split() -> bool:
    """Extract halo windows with static slices into a materialized (N, win,
    win) stack instead of per-chunk dynamic_slice from the canvas.  Costs
    ~1.5x image memory in the INPUT dtype (0.64 GB per u8 canvas at 20k —
    affordable; the ~23 GB concern is the f32 polynomial expansions, which
    stay chunk-bounded either way); candidate fix if on-hardware profiling
    attributes the 20k throughput drop to dynamic window extraction."""
    return os.environ.get("MICROALIGNER_TPU_FLOW_STATIC_SPLIT", "0") == "1"


def _dense_banded() -> bool:
    """MICROALIGNER_TPU_FLOW_DENSE: compute the tiled flow as full-width
    row BANDS instead of halo windows.  Square 1200^2 windows re-compute 44%
    of their pixels as halo (1.44 Mpix window per 1 Mpix interior); a
    full-width band re-computes only its two halo row-strips (~9-18% at the
    default band heights), and band extraction is a rows-only slice (lane-dim
    start 0) instead of 441 unaligned 2-D window copies.  Flow values differ
    from the per-tile computation only near former tile seams — where the
    band sees MORE real context than the reference's zero-padded halos, i.e.
    equal-or-better flow; E2E accuracy stays bounded by the warp-MSE bench
    gate.

    DEFAULT ON since the 2026-08-18 on-hardware A/B (after the Pallas
    kernels were lane-blocked so wide bands compile): 4096^2 register+warp
    78.5 -> 47.1 ms (whole image as ONE band - zero halo recompute), chained
    2048^2 0.41 -> 0.38 s, z-stack apply 0.085 -> 0.048 s device, 20k
    register on par with tiled (1.60 vs 1.58 s); hardware parity
    (tpu_parity_check --dense) passed strict bars vs cv2.  Set =0 for the
    strict per-tile parity path (the reference's exact tile decomposition)."""
    return os.environ.get("MICROALIGNER_TPU_FLOW_DENSE", "1") != "0"


def _band_rows(grid: TileGrid) -> int:
    """Band interior height: bounded working set (~22 Mpix of band pixels),
    multiple-of-8 sublane alignment, whole image when it already fits.

    The budget is an on-hardware result (2026-08-18, v5e 16 GB): 2176-row
    bands of a 20k canvas OOM inside the fused register (the full-res f32
    flow pair + canvases + one band's 15 bf16 channel planes + agg
    intermediates), 1088-row bands fit with the same steady-state rate."""
    env = os.environ.get("MICROALIGNER_TPU_FLOW_BAND_ROWS")
    if env:
        return max(8, int(env))
    w = grid.width + 2 * grid.overlap
    rows = int(22e6 // max(w, 1)) // 8 * 8
    return max(512, min(rows, grid.height))


def calc_flow_tiled(
    ref_img: jax.Array,
    mov_img: jax.Array,
    grid: TileGrid,
    win_size: int,
    num_iter: int,
) -> jax.Array:
    """(H, W) pair -> (H, W, 2) flow, computed per halo tile and stitched.

    The tile axis is sharded over the worker mesh (the reference's dask pool,
    flow_calc.py:88-98, as devices); within each device tiles run in
    fixed-size lax.map batches so HBM holds one batch's polynomial expansions
    at a time — a 20k x 20k image has 400 halo tiles, whose expansions would
    otherwise need ~23 GB.  Tiles keep the input dtype (u8 for DoG images)
    until inside the kernel.
    """
    if _dense_banded():
        return calc_flow_dense_banded(ref_img, mov_img, grid, win_size, num_iter)
    return _calc_flow_tiled(
        ref_img, mov_img, grid, win_size, num_iter, current_tile_mesh(),
        _tile_batch(), _static_split(),
    )


@functools.partial(
    jax.jit,
    static_argnames=("grid", "win_size", "num_iter", "mesh", "batch", "static_split"),
)
def _calc_flow_tiled(
    ref_img, mov_img, grid, win_size, num_iter, mesh,
    batch=_TILE_BATCH, static_split=False,
):
    # halo windows are sliced per chunk from 1x canvases (block copies inside
    # the bounded map) instead of materializing the (N, win, win) stacks —
    # at 20k x 20k the duplicated halo stacks alone would be ~2x image memory
    win_h, win_w = grid.tile_shape
    o = grid.overlap
    sl = (slice(None), slice(o, o + grid.tile_h), slice(o, o + grid.tile_w))

    def run_core(wr, wm):
        # x/y channels travel separately end-to-end: a trailing stacked dim
        # of 2 can get a padded T(8,128) layout (64x padding at 20k scale)
        # and costs a relayout copy per stack/unstack round trip
        fx, fy = _farneback_core_parts(
            wm.astype(jnp.float32), wr.astype(jnp.float32),
            win_size, num_iter, 1, 1.7,
        )
        return fx[sl], fy[sl]

    if static_split:
        tiles_r = split_into_tiles(ref_img, grid)
        tiles_m = split_into_tiles(mov_img, grid)
        fx, fy = tile_map(run_core, (tiles_r, tiles_m), batch=batch, mesh=mesh)
    else:
        canvas_r = pad_canvas(ref_img, grid)
        canvas_m = pad_canvas(mov_img, grid)
        origins = jnp.asarray(tile_origins(grid))

        def flow_chunk(orig, cr, cm):
            def get(c, p):
                return jax.lax.dynamic_slice(c, (p[0], p[1]), (win_h, win_w))

            wr = jax.lax.map(lambda p: get(cr, p), orig)
            wm = jax.lax.map(lambda p: get(cm, p), orig)
            return run_core(wr, wm)

        fx, fy = tile_map(
            flow_chunk, (origins,), batch=batch, mesh=mesh,
            broadcast=(canvas_r, canvas_m),
        )
    return jnp.stack(
        [stitch_interiors(fx, grid), stitch_interiors(fy, grid)], axis=-1
    )


def calc_flow_and_warp_tiled(
    ref_img: jax.Array,
    mov_img: jax.Array,
    warp_src: jax.Array,
    grid: TileGrid,
    win_size: int,
    num_iter: int,
    out_dtype_name: str,
) -> tuple[jax.Array, jax.Array]:
    """``calc_flow_tiled`` fused with the post-flow warp of ``warp_src``.

    Returns ``(flow (H, W, 2) f32, warped (H, W) out_dtype)`` — exactly
    ``calc_flow_tiled(ref, mov, ...)`` followed by
    ``warp_tiled_dtype(warp_src, flow, ...)``, but the warp runs inside the
    same bounded tile chunk while the tile's flow is still in HBM: the
    separate warp pass re-read the stitched flow (3.3 GB at 20k x 20k), the
    warp-source canvas, and paid its own window-extraction sweep.  Per-tile
    semantics are identical to ``_warp_tiled_jit`` by construction: the same
    canvas window, the same interior flow with a zero halo (only interior
    outputs are kept), the same sampler and round/clip.

    Registration levels warp the PRE-DoG moving image with the flow computed
    on the DoG pair (optflow_registrator.py:128-133), hence the separate
    ``warp_src``; pass ``mov_img`` for the plain register+warp step.
    """
    if _dense_banded():
        return calc_flow_and_warp_dense_banded(
            ref_img, mov_img, warp_src, grid, win_size, num_iter, out_dtype_name
        )
    return _calc_flow_and_warp_tiled(
        ref_img, mov_img, warp_src, grid, win_size, num_iter,
        out_dtype_name, current_tile_mesh(), _tile_batch(), _static_split(),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid", "win_size", "num_iter", "out_dtype_name", "mesh", "batch",
        "static_split",
    ),
)
def _calc_flow_and_warp_tiled(
    ref_img, mov_img, warp_src, grid, win_size, num_iter,
    out_dtype_name, mesh, batch=_TILE_BATCH, static_split=False,
):
    from microaligner_tpu.ops.warp import warp_with_flow_parts_batched

    win_h, win_w = grid.tile_shape
    o = grid.overlap
    out_dt = jnp.dtype(out_dtype_name)

    def finish(w):
        if jnp.issubdtype(out_dt, jnp.integer):
            info = jnp.iinfo(out_dt)
            w = jnp.clip(jnp.round(w), info.min, info.max)
        return w.astype(out_dt)

    # halo mask: the warp pass feeds the sampler interior flow with a zero
    # halo (halo outputs are cropped; see _warp_tiled_jit), so zero it here
    # too for bit-identical border blending
    interior = jnp.zeros((win_h, win_w), jnp.float32)
    interior = interior.at[o : o + grid.tile_h, o : o + grid.tile_w].set(1.0)
    sl = (slice(None), slice(o, o + grid.tile_h), slice(o, o + grid.tile_w))

    def run_core(wr, wm, ws):
        fx, fy = _farneback_core_parts(
            wm.astype(jnp.float32), wr.astype(jnp.float32),
            win_size, num_iter, 1, 1.7,
        )
        warped = warp_with_flow_parts_batched(
            ws.astype(jnp.float32), fx * interior, fy * interior
        )
        return fx[sl], fy[sl], finish(warped[sl])

    if static_split:
        tiles_r = split_into_tiles(ref_img, grid)
        tiles_m = split_into_tiles(mov_img, grid)
        tiles_w = split_into_tiles(warp_src, grid)
        fx, fy, warped = tile_map(
            run_core, (tiles_r, tiles_m, tiles_w), batch=batch, mesh=mesh
        )
    else:
        canvas_r = pad_canvas(ref_img, grid)
        canvas_m = pad_canvas(mov_img, grid)
        canvas_w = pad_canvas(warp_src, grid)
        origins = jnp.asarray(tile_origins(grid))

        def flow_warp_chunk(orig, cr, cm, cw):
            def get(c, p):
                return jax.lax.dynamic_slice(c, (p[0], p[1]), (win_h, win_w))

            wr = jax.lax.map(lambda p: get(cr, p), orig)
            wm = jax.lax.map(lambda p: get(cm, p), orig)
            ws = jax.lax.map(lambda p: get(cw, p), orig)
            return run_core(wr, wm, ws)

        fx, fy, warped = tile_map(
            flow_warp_chunk, (origins,), batch=batch, mesh=mesh,
            broadcast=(canvas_r, canvas_m, canvas_w),
        )
    flow = jnp.stack(
        [stitch_interiors(fx, grid), stitch_interiors(fy, grid)], axis=-1
    )
    return flow, stitch_interiors(warped, grid)


def calc_flow_dense_banded(
    ref_img: jax.Array,
    mov_img: jax.Array,
    grid: TileGrid,
    win_size: int,
    num_iter: int,
) -> jax.Array:
    """Full-width row-band Farneback: ``(H, W)`` pair -> ``(H, W, 2)`` flow.

    Same boundary convention as the tiled path (``overlap`` zeros around the
    image); each band is the full image width plus the x halo, so the only
    re-computed pixels are the two halo row-strips.  Bands run sequentially
    (bounded working set); extraction is a rows-only ``dynamic_slice`` whose
    lane-dim start is 0.  See ``_dense_banded`` for the semantics note.
    """
    return _calc_flow_dense_banded(
        ref_img, mov_img, grid, win_size, num_iter, _band_rows(grid),
        current_tile_mesh(),
    )


@functools.partial(
    jax.jit, static_argnames=("grid", "win_size", "num_iter", "band_rows", "mesh")
)
def _calc_flow_dense_banded(
    ref_img, mov_img, grid, win_size, num_iter, band_rows, mesh=None
):
    fx, fy = _dense_banded_core(
        ref_img, mov_img, None, grid, win_size, num_iter, band_rows, mesh
    )[:2]
    return jnp.stack([fx, fy], axis=-1)


def calc_flow_and_warp_dense_banded(
    ref_img: jax.Array,
    mov_img: jax.Array,
    warp_src: jax.Array,
    grid: TileGrid,
    win_size: int,
    num_iter: int,
    out_dtype_name: str,
) -> tuple[jax.Array, jax.Array]:
    """``calc_flow_dense_banded`` fused with the post-flow warp of
    ``warp_src`` (same construction as ``calc_flow_and_warp_tiled``: the band
    halo's flow is zeroed, the halo'd band source is sampled, interiors are
    kept)."""
    return _calc_flow_and_warp_dense_banded(
        ref_img, mov_img, warp_src, grid, win_size, num_iter,
        out_dtype_name, _band_rows(grid), current_tile_mesh(),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid", "win_size", "num_iter", "out_dtype_name", "band_rows", "mesh",
    ),
)
def _calc_flow_and_warp_dense_banded(
    ref_img, mov_img, warp_src, grid, win_size, num_iter, out_dtype_name,
    band_rows, mesh=None,
):
    fx, fy, warped = _dense_banded_core(
        ref_img, mov_img, warp_src, grid, win_size, num_iter, band_rows, mesh,
        out_dtype_name=out_dtype_name,
    )
    return jnp.stack([fx, fy], axis=-1), warped


def _dense_banded_core(
    ref_img, mov_img, warp_src, grid, win_size, num_iter, band_rows, mesh,
    out_dtype_name=None,
):
    from microaligner_tpu.ops.warp import warp_with_flow_parts_batched

    h, w, o = grid.height, grid.width, grid.overlap
    nb = -(-h // band_rows)
    slab_h = band_rows + 2 * o
    slab_w = w + 2 * o

    def slab(img):
        # overlap zeros on all sides + bottom padding to a whole band count
        # (the same constant-border convention as pad_canvas)
        return jnp.pad(
            img, ((o, nb * band_rows - h + o), (o, o)), mode="constant"
        )

    canvases = [slab(ref_img), slab(mov_img)]
    if warp_src is not None:
        canvases.append(slab(warp_src))

    # band-halo flow is zeroed for the fused warp, exactly like the tiled
    # run_core's interior mask (borders blend identically to _warp_tiled_jit)
    interior = jnp.zeros((slab_h, slab_w), jnp.float32)
    interior = interior.at[o : o + band_rows, o : o + w].set(1.0)
    out_dt = None if out_dtype_name is None else jnp.dtype(out_dtype_name)

    def finish(x):
        if jnp.issubdtype(out_dt, jnp.integer):
            info = jnp.iinfo(out_dt)
            x = jnp.clip(jnp.round(x), info.min, info.max)
        return x.astype(out_dt)

    def band(i, cr, cm, *cw):
        row0 = i * band_rows
        br = jax.lax.dynamic_slice(cr, (row0, 0), (slab_h, slab_w))
        bm = jax.lax.dynamic_slice(cm, (row0, 0), (slab_h, slab_w))
        fx, fy = _farneback_core_parts(
            bm[None].astype(jnp.float32), br[None].astype(jnp.float32),
            win_size, num_iter, 1, 1.7,
        )
        sl = (0, slice(o, o + band_rows), slice(o, o + w))
        if not cw:
            return fx[sl], fy[sl]
        bw = jax.lax.dynamic_slice(cw[0], (row0, 0), (slab_h, slab_w))
        warped = warp_with_flow_parts_batched(
            bw[None].astype(jnp.float32), fx * interior, fy * interior
        )
        return fx[sl], fy[sl], finish(warped[sl])

    # band axis sharded over the worker mesh (same DP axis as the tile path;
    # one device = a plain sequential lax.map with bounded HBM)
    outs = tile_map(
        band, (jnp.arange(nb),), batch=1, mesh=mesh, unbatched=True,
        broadcast=tuple(canvases),
    )
    return tuple(x.reshape((nb * band_rows,) + x.shape[2:])[:h] for x in outs)


class TileFlowCalc:
    """Property-style API matching the reference (flow_calc.py:50-57)."""

    def __init__(self):
        self.ref_img = np.array([])
        self.mov_img = np.array([])
        self.num_iter = 1
        self.win_size = 51
        self.tile_size = 1000
        self.overlap = 100

    def calc_flow(self) -> np.ndarray:
        ref = jnp.asarray(self.ref_img)
        mov = jnp.asarray(self.mov_img)
        max_dim = max(ref.shape)
        if max_dim / self.tile_size < 2:
            flow = farneback(mov, ref, win_size=self.win_size, num_iter=self.num_iter)
        else:
            grid = TileGrid.for_image(ref.shape, self.tile_size, self.overlap)
            flow = calc_flow_tiled(ref, mov, grid, self.win_size, self.num_iter)
        # free inputs like the reference (flow_calc.py:69,74)
        self.ref_img = np.array([])
        self.mov_img = np.array([])
        return np.asarray(jax.device_get(flow))
