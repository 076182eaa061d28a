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

__all__ = ["Warper", "warp_tiled"]


_TILE_BATCH = 32  # bounds live tile working set for the apply phase


def _warp_tiled_impl(image: jax.Array, flow: jax.Array, grid: TileGrid, out_dtype_name: str) -> jax.Array:
    return _warp_tiled_jit(image, flow, grid, out_dtype_name, current_tile_mesh())


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


def compose_flows_tiled(flow1: jax.Array, flow2: jax.Array, grid: TileGrid) -> jax.Array:
    """Tile-wise flow composition (merge_two_flows over halo tiles, stitched),
    tile axis sharded over the worker mesh, bounded batches within each device
    (reference optflow_registrator.py:217-233)."""
    return _compose_flows_tiled_jit(flow1, flow2, grid, current_tile_mesh())


@functools.partial(jax.jit, static_argnames=("grid", "mesh"))
def _compose_flows_tiled_jit(flow1, flow2, grid, mesh):
    # both flows' halo windows come from 1x canvases per chunk (the per-tile
    # zero-max shortcuts of merge_two_flows are computed over the full halo
    # tile, exactly like the reference, so f1 windows are needed too)
    from microaligner_tpu.ops.warp import compose_flows_batched

    c1x = pad_canvas(flow1[..., 0], grid)
    c1y = pad_canvas(flow1[..., 1], grid)
    c2x = pad_canvas(flow2[..., 0], grid)
    c2y = pad_canvas(flow2[..., 1], grid)
    origins = jnp.asarray(tile_origins(grid))
    win_h, win_w = grid.tile_shape
    o = grid.overlap

    def compose_chunk(orig, c1x_, c1y_, c2x_, c2y_):
        def wins(c):
            return jax.lax.map(
                lambda p: jax.lax.dynamic_slice(c, (p[0], p[1]), (win_h, win_w)),
                orig,
            )

        merged = compose_flows_batched(
            jnp.stack([wins(c1x_), wins(c1y_)], axis=-1),
            jnp.stack([wins(c2x_), wins(c2y_)], axis=-1),
        )
        interior = merged[:, o : o + grid.tile_h, o : o + grid.tile_w]
        return interior[..., 0], interior[..., 1]

    mx, my = tile_map(
        compose_chunk,
        (origins,),
        batch=_TILE_BATCH,
        mesh=mesh,
        broadcast=(c1x, c1y, c2x, c2y),
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
        image = self.image
        flow = self.flow
        if image is None or np.size(image) == 0:
            raise ValueError("No image provided")
        if flow is None or np.size(flow) == 0:
            raise ValueError("No flow provided")
        orig_dtype = image.dtype
        grid = TileGrid.for_image(image.shape, self.tile_size, self.overlap)
        out = warp_tiled(jnp.asarray(image), jnp.asarray(flow), grid)
        out = np.asarray(jax.device_get(out))
        # free inputs like the reference does (warper.py:40,44)
        self.image = np.array([])
        self.flow = np.array([])
        if np.issubdtype(orig_dtype, np.integer):
            info = np.iinfo(orig_dtype)
            out = np.clip(np.round(out), info.min, info.max)
        return out.astype(orig_dtype)
