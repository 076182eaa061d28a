"""Tiled flow-field warping — the public ``Warper`` API.

Mirrors the reference Warper (optflow_reg/warper.py:30-76): image and flow are
split into overlapping tiles, each tile is remapped by ``-flow + meshgrid``,
and interiors are stitched back.  A pixel can only pull from within its own
halo-expanded tile (displacements beyond ``overlap`` px read zeros), exactly
like the reference's per-tile ``cv.remap``.

The reference's serial Python tile loop (warper.py:73-76 — "parallelizing this
loop is not worth it" on CPU) becomes a single vmapped kernel over the tile
axis: one XLA launch, trivially shardable across TPU devices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from microaligner_tpu.ops.warp import warp_with_flow_batched
from microaligner_tpu.parallel.tile_runner import current_tile_mesh, tile_map
from microaligner_tpu.tiles import (
    TileGrid,
    pad_canvas,
    split_interiors,
    stitch_interiors,
    tile_origins,
)

__all__ = ["Warper", "warp_tiled", "warp_planes_tiled"]


_TILE_BATCH = 32  # bounds live tile working set for the apply phase
_SHIFT_MARGIN = 128  # canvas slack for dc-shifted compose windows (px)


def _warp_tiled_impl(image: jax.Array, flow: jax.Array, grid: TileGrid, out_dtype_name: str) -> jax.Array:
    from microaligner_tpu.optflow.flow_calc import _band_rows, _dense_banded

    if _dense_banded():
        return _warp_banded_jit(
            image, flow, grid, out_dtype_name, _band_rows(grid),
            current_tile_mesh(),
        )
    return _warp_tiled_jit(image, flow, grid, out_dtype_name, current_tile_mesh())


@functools.partial(
    jax.jit, static_argnames=("grid", "out_dtype_name", "band_rows", "mesh")
)
def _warp_banded_jit(image, flow, grid, out_dtype_name, band_rows, mesh=None):
    """Full-width row-band warp (the MICROALIGNER_TPU_FLOW_DENSE apply path).

    Interior results are identical to ``_warp_tiled_jit`` whenever flow
    displacements stay within the halo (the shared contract): each output
    pixel samples the same absolute source pixel, present in both the tile's
    halo window and the band slab.  The band slab spans the full width, so
    the 44% halo-window re-read and the (N, tile, tile) -> canvas transpose
    stitch disappear; extraction is a rows-only slice with lane start 0.
    """
    out_dt = jnp.dtype(out_dtype_name)
    o = grid.overlap
    h, w = grid.height, grid.width
    nb = -(-h // band_rows)
    slab_h = band_rows + 2 * o
    slab_w = w + 2 * o

    def finish(x):
        if jnp.issubdtype(out_dt, jnp.integer):
            info = jnp.iinfo(out_dt)
            x = jnp.clip(jnp.round(x), info.min, info.max)
        return x.astype(out_dt)

    canvas = jnp.pad(image, ((o, nb * band_rows - h + o), (o, o)), mode="constant")
    # flow interiors padded to whole bands (rows) — channels separate
    fpad = ((0, nb * band_rows - h), (0, 0))
    fx_c = jnp.pad(flow[..., 0], fpad)
    fy_c = jnp.pad(flow[..., 1], fpad)
    zo = ((o, o), (o, o))

    def band(i, cv, fxc, fyc):
        row0 = i * band_rows
        src = jax.lax.dynamic_slice(cv, (row0, 0), (slab_h, slab_w))
        fx = jax.lax.dynamic_slice(fxc, (row0, 0), (band_rows, w))
        fy = jax.lax.dynamic_slice(fyc, (row0, 0), (band_rows, w))
        fw = jnp.stack([jnp.pad(fx, zo), jnp.pad(fy, zo)], axis=-1)
        out = warp_with_flow_batched(src[None].astype(jnp.float32), fw[None])
        return finish(out[0, o : o + band_rows, o : o + w])

    warped = tile_map(
        band, (jnp.arange(nb),), batch=1, mesh=mesh, unbatched=True,
        broadcast=(canvas, fx_c, fy_c),
    )
    return warped.reshape(nb * band_rows, w)[:h]


@functools.partial(jax.jit, static_argnames=("grid", "out_dtype_name", "mesh"))
def _warp_tiled_jit(image, flow, grid, out_dtype_name, mesh):
    """Tiled warp, tile axis sharded over the worker mesh, with bounded
    batches and minimal live memory:

    * image halo windows are sliced per chunk from a 1x canvas in the
      image's native dtype (u8/u16 planes stay small; no halo-duplicated
      stacks — those would triple flow-sized memory at 20k scale),
    * flow travels as interior-only tiles (a pure reshape of the flow, 1x);
      only interior output pixels use flow values, so the halo flow the old
      per-tile split carried was computed and then cropped away,
    * each chunk is cast -> warped -> rounded back inside the map, so only
      output-dtype tiles accumulate,
    * flow channels travel separately (a rank-5 stack with a trailing dim of
      2 can get a T(8,128) layout = 64x padding at 20k scale).
    """
    out_dt = jnp.dtype(out_dtype_name)
    o = grid.overlap
    win_h, win_w = grid.tile_shape

    def finish(w):
        if jnp.issubdtype(out_dt, jnp.integer):
            info = jnp.iinfo(out_dt)
            w = jnp.clip(jnp.round(w), info.min, info.max)
        return w.astype(out_dt)

    canvas = pad_canvas(image, grid)
    fx_int = split_interiors(flow[..., 0], grid)
    fy_int = split_interiors(flow[..., 1], grid)
    origins = jnp.asarray(tile_origins(grid))

    def warp_chunk(orig, fxt, fyt, canvas_):
        wins = jax.lax.map(
            lambda p: jax.lax.dynamic_slice(canvas_, (p[0], p[1]), (win_h, win_w)),
            orig,
        )
        # window-sized flow: zero halo (those outputs are cropped), interiors
        # are the real flow — identical interior results to the halo'd split
        zo = ((0, 0), (o, o), (o, o))
        fw = jnp.stack([jnp.pad(fxt, zo), jnp.pad(fyt, zo)], axis=-1)
        w = warp_with_flow_batched(wins.astype(jnp.float32), fw)
        return finish(w[:, o : o + grid.tile_h, o : o + grid.tile_w])

    warped = tile_map(
        warp_chunk,
        (origins, fx_int, fy_int),
        batch=_TILE_BATCH,
        mesh=mesh,
        broadcast=(canvas,),
    )
    return stitch_interiors(warped, grid)


def warp_tiled(image: jax.Array, flow: jax.Array, grid: TileGrid) -> jax.Array:
    """Warp ``image`` (H, W) by ``flow`` (H, W, 2) tile-by-tile (f32 output)."""
    return _warp_tiled_impl(image, flow, grid, "float32")


def warp_planes_tiled(
    imgs: jax.Array, flow: jax.Array, grid: TileGrid, dtype_name: str
) -> jax.Array:
    """Warp N planes (N, H, W) by ONE shared flow, banded, rounded to dtype.

    The multi-channel/z apply shape (reference __main__.py:288-302).  Same
    per-band halo semantics as ``_warp_banded_jit``; the flow-derived bilinear
    weights are computed once per band and broadcast over the plane axis
    (ops/warp.py::warp_planes_with_flow), instead of once per plane.
    """
    from microaligner_tpu.optflow.flow_calc import _band_rows

    return _warp_planes_banded_jit(
        imgs, flow, grid, dtype_name, _band_rows(grid), current_tile_mesh()
    )


@functools.partial(
    jax.jit, static_argnames=("grid", "out_dtype_name", "band_rows", "mesh")
)
def _warp_planes_banded_jit(imgs, flow, grid, out_dtype_name, band_rows, mesh=None):
    from microaligner_tpu.ops.warp import warp_planes_with_flow

    out_dt = jnp.dtype(out_dtype_name)
    o = grid.overlap
    h, w = grid.height, grid.width
    n = imgs.shape[0]
    nb = -(-h // band_rows)
    slab_h = band_rows + 2 * o
    slab_w = w + 2 * o

    def finish(x):
        if jnp.issubdtype(out_dt, jnp.integer):
            info = jnp.iinfo(out_dt)
            x = jnp.clip(jnp.round(x), info.min, info.max)
        return x.astype(out_dt)

    canvas = jnp.pad(
        imgs, ((0, 0), (o, nb * band_rows - h + o), (o, o)), mode="constant"
    )
    fpad = ((0, nb * band_rows - h), (0, 0))
    fx_c = jnp.pad(flow[..., 0], fpad)
    fy_c = jnp.pad(flow[..., 1], fpad)
    zo = ((o, o), (o, o))

    def band(i, cv, fxc, fyc):
        row0 = i * band_rows
        src = jax.lax.dynamic_slice(cv, (0, row0, 0), (n, slab_h, slab_w))
        fx = jax.lax.dynamic_slice(fxc, (row0, 0), (band_rows, w))
        fy = jax.lax.dynamic_slice(fyc, (row0, 0), (band_rows, w))
        fw = jnp.stack([jnp.pad(fx, zo), jnp.pad(fy, zo)], axis=-1)
        out = warp_planes_with_flow(src.astype(jnp.float32), fw)
        return finish(out[:, o : o + band_rows, o : o + w])

    warped = tile_map(
        band, (jnp.arange(nb),), batch=1, mesh=mesh, unbatched=True,
        broadcast=(canvas, fx_c, fy_c),
    )
    # tile_map returns (nb, n, band_rows, w): restore the plane-major layout
    return jnp.moveaxis(warped, 1, 0).reshape(n, nb * band_rows, w)[:, :h]


def compose_flows_tiled(flow1: jax.Array, flow2: jax.Array, grid: TileGrid) -> jax.Array:
    """Tile-wise flow composition (merge_two_flows over halo tiles, stitched),
    tile axis sharded over the worker mesh, bounded batches within each device
    (reference optflow_registrator.py:217-233)."""
    return _compose_flows_tiled_jit(flow1, flow2, grid, current_tile_mesh())


@functools.partial(jax.jit, static_argnames=("grid", "mesh"))
def _compose_flows_tiled_jit(flow1, flow2, grid, mesh):
    """Windowed composition: fast for ARBITRARY flow magnitudes.

    ``merged(p) = f1(p) + f2(p - f1(p))`` (the Warper's pull convention)
    with f2 read per halo tile and zeros outside it, exactly like the
    reference's per-tile ``merge_two_flows`` with its intended meshgrid.
    Accumulated pyramid flows reach tens of pixels, so sampling f2 at
    ``p - f1`` directly would always exceed the banded sampler's contract
    and fall back to the ~50x slower exact gather.
    Instead each tile's f2 window is fetched DISPLACED by the rounded mean
    interior flow (a device-computed dynamic_slice start — a block copy);
    the residual ``f1 - dc`` is small for smooth flows, so the banded Pallas
    sampler applies.  Reference semantics are preserved exactly:

    * samples landing outside the tile's ORIGINAL halo extent are zeroed by
      an explicit mask (the shifted window may cover ground the reference's
      per-tile remap could not see);
    * the per-tile ``max() == 0`` shortcuts are evaluated on the full
      (unshifted) halo tiles;
    * residuals that still exceed the band trigger the sampler's own exact
      fallback within the shifted window — correct because the mask, not
      window extent, enforces the zero-outside contract for in-window taps,
      and out-of-window taps can only occur for pixels the mask zeroes
      (|residual| > band  =>  |f1 - dc| > overlap - band is impossible when
      dc keeps the window inside the canvas... such pixels read 0 from the
      window's canvas padding or are masked).
    """
    from microaligner_tpu.ops.warp import sample_displaced_batched

    # extra margin beyond the halo so dc-shifted windows stay inside the
    # canvas for flows up to ~±_SHIFT_MARGIN px (the margin content is only
    # ever read where the in_orig mask zeroes it, so zeros are correct)
    M = _SHIFT_MARGIN
    c1x = pad_canvas(flow1[..., 0], grid)
    c1y = pad_canvas(flow1[..., 1], grid)
    c2x_plain = pad_canvas(flow2[..., 0], grid)
    c2y_plain = pad_canvas(flow2[..., 1], grid)
    c2x = jnp.pad(c2x_plain, ((M, M), (M, M)))
    c2y = jnp.pad(c2y_plain, ((M, M), (M, M)))
    origins = jnp.asarray(tile_origins(grid))
    win_h, win_w = grid.tile_shape
    o = grid.overlap
    ch, cw = c2x.shape  # shifted-window canvas dims (with margin)

    # When the overlap divides the tile pitch, every unshifted window is an
    # aligned run of o x o blocks, so the reference's f2 zero-shortcut test
    # (max over the UNSHIFTED halo tile) can read a tiny slice of a coarse
    # block-max canvas instead of re-fetching two full halo windows per tile.
    use_coarse = o > 0 and grid.tile_h % o == 0 and grid.tile_w % o == 0
    if use_coarse:
        ph, pw = c2x_plain.shape  # = ny*tile_h + 2o, nx*tile_w + 2o (o-aligned)
        cmax2 = (
            jnp.maximum(c2x_plain, c2y_plain)
            .reshape(ph // o, o, pw // o, o)
            .max(axis=(1, 3))
        )
        cwh, cww = win_h // o, win_w // o
    else:
        cmax2 = jnp.zeros((1, 1), jnp.float32)  # unused

    def compose_chunk(orig, c1x_, c1y_, c2x_, c2y_, cmax2_):
        def wins_at(c, starts):
            return jax.lax.map(
                lambda s: jax.lax.dynamic_slice(c, (s[0], s[1]), (win_h, win_w)),
                starts,
            )

        f1xw = wins_at(c1x_, orig)  # (B, win, win) full halo tiles of f1
        f1yw = wins_at(c1y_, orig)

        # per-tile integer displacement from the mean interior SAMPLING
        # offset (-f1: the composition pulls f2 from p - f1), clamped so the
        # shifted window stays inside the canvas
        f1x_int = f1xw[:, o : o + grid.tile_h, o : o + grid.tile_w]
        f1y_int = f1yw[:, o : o + grid.tile_h, o : o + grid.tile_w]
        dcx = jnp.round(jnp.mean(-f1x_int, axis=(1, 2))).astype(jnp.int32)
        dcy = jnp.round(jnp.mean(-f1y_int, axis=(1, 2))).astype(jnp.int32)
        # reference merge_two_flows shortcut test on the full halo tile
        f1_zero_flat = (
            jnp.maximum(jnp.max(f1xw, axis=(1, 2)), jnp.max(f1yw, axis=(1, 2))) == 0
        )
        if use_coarse:
            # force dc = 0 on f1-zero tiles so the SHIFTED f2 window equals
            # the unshifted one there — it then doubles as the verbatim-f2
            # output the reference returns for those tiles, and the two
            # unshifted-window fetches below become unnecessary
            dcx = jnp.where(f1_zero_flat, 0, dcx)
            dcy = jnp.where(f1_zero_flat, 0, dcy)
        # Guard (ADVICE r2): a tile whose flow deviates from its mean by more
        # than the window margin could need taps inside its ORIGINAL halo
        # extent that the shifted window does not cover (the exact-fallback
        # sampler would read window-edge zeros there, diverging from the
        # reference's per-tile remap).  Such tiles revert to the unshifted
        # window (dc = 0), whose zero-outside extent IS the reference
        # semantics; the sampler's exact fallback then handles the large
        # residuals correctly.
        rmax = jnp.maximum(
            jnp.max(jnp.abs(-f1xw - dcx[:, None, None].astype(jnp.float32)), axis=(1, 2)),
            jnp.max(jnp.abs(-f1yw - dcy[:, None, None].astype(jnp.float32)), axis=(1, 2)),
        )
        shift_ok = rmax <= o - 1
        dcx = jnp.where(shift_ok, dcx, 0)
        dcy = jnp.where(shift_ok, dcy, 0)
        # f2's canvas carries the extra _SHIFT_MARGIN: origins shift by M
        sy = jnp.clip(orig[:, 0] + M + dcy, 0, ch - win_h)
        sx = jnp.clip(orig[:, 1] + M + dcx, 0, cw - win_w)
        adcy = (sy - orig[:, 0] - M).astype(jnp.float32)  # shift after clamp
        adcx = (sx - orig[:, 1] - M).astype(jnp.float32)

        swins = jnp.stack([sy, sx], axis=-1)
        f2xw = wins_at(c2x_, swins)
        f2yw = wins_at(c2y_, swins)

        # zero the shifted window's cells that lie OUTSIDE the tile's
        # original halo extent: cell w sits at original-window coordinate
        # w + adc, and the reference's per-tile remap reads zeros there.
        # With the content zeroed, bilinear border blending matches the
        # unshifted semantics exactly; in-band residual taps never reach the
        # shifted window's own edges (margin = overlap - band >= 1).
        wxi = jax.lax.broadcasted_iota(jnp.float32, (win_h, win_w), 1)[None]
        wyi = jax.lax.broadcasted_iota(jnp.float32, (win_h, win_w), 0)[None]
        ox_ = wxi + adcx[:, None, None]
        oy_ = wyi + adcy[:, None, None]
        in_orig = (ox_ >= 0) & (ox_ < win_w) & (oy_ >= 0) & (oy_ < win_h)
        f2xw = jnp.where(in_orig, f2xw, 0.0)
        f2yw = jnp.where(in_orig, f2yw, 0.0)

        # residual sampling field over the window: total offset -f1 minus the
        # window shift (halo residuals come from the full f1 window so halo
        # outputs are well-defined pre-crop)
        rx = -f1xw - adcx[:, None, None]
        ry = -f1yw - adcy[:, None, None]
        rflow = jnp.stack([rx, ry], axis=-1)
        sx2 = sample_displaced_batched(f2xw[..., None], rflow)[..., 0]
        sy2 = sample_displaced_batched(f2yw[..., None], rflow)[..., 0]

        mx_ = f1xw + sx2
        my_ = f1yw + sy2

        # reference merge_two_flows short-circuits on all-non-positive tiles
        f1_zero = f1_zero_flat[:, None, None]
        if use_coarse:
            # f2 zero-shortcut (UNSHIFTED tile max) from the coarse block-max
            # canvas: the window is an aligned (win/o, win/o) block slice
            cm = jax.lax.map(
                lambda p: jax.lax.dynamic_slice(
                    cmax2_, (p[0] // o, p[1] // o), (cwh, cww)
                ),
                orig,
            )
            f2_zero = (jnp.max(cm, axis=(1, 2)) == 0)[:, None, None]
            # f1-zero tiles had dc forced to 0, so their shifted windows ARE
            # the unshifted f2 tiles the reference returns verbatim
            mx_ = jnp.where(f1_zero, f2xw, jnp.where(f2_zero, f1xw, mx_))
            my_ = jnp.where(f1_zero, f2yw, jnp.where(f2_zero, f1yw, my_))
        else:
            # f2 zero-shortcut uses the UNSHIFTED tile, matching the reference
            orig_m = orig + M
            f2xw0 = wins_at(c2x_, orig_m)
            f2yw0 = wins_at(c2y_, orig_m)
            f2_zero = (jnp.maximum(jnp.max(f2xw0, axis=(1, 2)), jnp.max(f2yw0, axis=(1, 2))) == 0)[:, None, None]
            mx_ = jnp.where(f1_zero, f2xw0, jnp.where(f2_zero, f1xw, mx_))
            my_ = jnp.where(f1_zero, f2yw0, jnp.where(f2_zero, f1yw, my_))

        return (
            mx_[:, o : o + grid.tile_h, o : o + grid.tile_w],
            my_[:, o : o + grid.tile_h, o : o + grid.tile_w],
        )

    mx, my = tile_map(
        compose_chunk,
        (origins,),
        batch=_TILE_BATCH,
        mesh=mesh,
        broadcast=(c1x, c1y, c2x, c2y, cmax2),
    )
    return jnp.stack(
        [stitch_interiors(mx, grid), stitch_interiors(my, grid)], axis=-1
    )


def warp_tiled_dtype(image: jax.Array, flow: jax.Array, grid: TileGrid, dtype_name: str) -> jax.Array:
    """Tiled warp rounded back to an integer dtype (cv.remap rounds),
    rounding inside each tile batch to bound live memory."""
    return _warp_tiled_impl(image, flow, grid, dtype_name)


class Warper:
    """Property-style API matching the reference (optflow_reg/warper.py:30-53).

    >>> w = Warper()
    >>> w.image = img      # (H, W)
    >>> w.flow = flow      # (H, W, 2)
    >>> out = w.warp()
    """

    def __init__(self):
        self.image = np.array([])
        self.flow = np.array([])
        self.tile_size = 1000
        self.overlap = 100

    def warp(self):
        if (
            self.image is not None
            and np.size(self.image)
            and np.dtype(self.image.dtype).itemsize == 8
        ):
            # 64-bit planes: JAX runs with x64 disabled, so round/clip to the
            # full 64-bit range on host (f32 warp output, as before)
            image, flow = self.image, self.flow
            if flow is None or np.size(flow) == 0:
                raise ValueError("No flow provided")
            orig_dtype = image.dtype
            grid = TileGrid.for_image(tuple(image.shape), self.tile_size, self.overlap)
            out = np.asarray(jax.device_get(
                warp_tiled(jnp.asarray(image, jnp.float32), jnp.asarray(flow), grid)
            ))
            self.image = np.array([])
            self.flow = np.array([])
            if np.issubdtype(orig_dtype, np.integer):
                info = np.iinfo(orig_dtype)
                out = np.clip(np.round(out), info.min, info.max)
            return out.astype(orig_dtype)
        return np.asarray(jax.device_get(self.warp_device()))

    def warp_device(self) -> jax.Array:
        """:meth:`warp` but the result stays on device.

        Rounding/clip back to the input dtype happens inside the tiled kernel
        (``_warp_tiled_jit.finish`` — same clip(round()) as cv.remap), so the
        host API and this one return identical planes.  Use from pipeline
        code whose next consumer is also device-side: at 20k x 20k the warped
        u16 ref plane is 0.8 GB per cycle.
        """
        image = self.image
        flow = self.flow
        if image is None or np.size(image) == 0:
            raise ValueError("No image provided")
        if flow is None or np.size(flow) == 0:
            raise ValueError("No flow provided")
        grid = TileGrid.for_image(tuple(image.shape), self.tile_size, self.overlap)
        out = warp_tiled_dtype(
            jnp.asarray(image), jnp.asarray(flow), grid, np.dtype(image.dtype).name
        )
        # free inputs like the reference does (warper.py:40,44)
        self.image = np.array([])
        self.flow = np.array([])
        return out
