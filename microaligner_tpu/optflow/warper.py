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
from microaligner_tpu.tiles import TileGrid, split_into_tiles, stitch_tiles

__all__ = ["Warper", "warp_tiled"]


_TILE_BATCH = 32  # bounds live tile working set for the apply phase


@functools.partial(jax.jit, static_argnames=("grid",))
def warp_tiled(image: jax.Array, flow: jax.Array, grid: TileGrid) -> jax.Array:
    """Warp ``image`` (H, W) by ``flow`` (H, W, 2) tile-by-tile, in bounded
    batches so 20k-scale planes don't hold every halo tile at once."""
    img_tiles = split_into_tiles(image.astype(jnp.float32), grid)
    flow_tiles = split_into_tiles(flow, grid)
    n = img_tiles.shape[0]
    if n <= _TILE_BATCH:
        warped = warp_with_flow_batched(img_tiles, flow_tiles)
        return stitch_tiles(warped, grid)
    pad = (-n) % _TILE_BATCH
    if pad:
        img_tiles = jnp.concatenate(
            [img_tiles, jnp.zeros((pad,) + img_tiles.shape[1:], img_tiles.dtype)]
        )
        flow_tiles = jnp.concatenate(
            [flow_tiles, jnp.zeros((pad,) + flow_tiles.shape[1:], flow_tiles.dtype)]
        )
    nb = img_tiles.shape[0] // _TILE_BATCH
    it = img_tiles.reshape((nb, _TILE_BATCH) + img_tiles.shape[1:])
    ft = flow_tiles.reshape((nb, _TILE_BATCH) + flow_tiles.shape[1:])
    warped = jax.lax.map(lambda xf: warp_with_flow_batched(xf[0], xf[1]), (it, ft))
    warped = warped.reshape((nb * _TILE_BATCH,) + warped.shape[2:])[:n]
    return stitch_tiles(warped, grid)


@functools.partial(jax.jit, static_argnames=("grid",))
def compose_flows_tiled(flow1: jax.Array, flow2: jax.Array, grid: TileGrid) -> jax.Array:
    """Tile-wise flow composition (merge_two_flows over halo tiles, stitched),
    in bounded batches (reference optflow_registrator.py:217-233)."""
    from microaligner_tpu.ops.warp import compose_flows_batched

    f1 = split_into_tiles(flow1, grid)
    f2 = split_into_tiles(flow2, grid)
    n = f1.shape[0]
    if n <= _TILE_BATCH:
        return stitch_tiles(compose_flows_batched(f1, f2), grid)
    pad = (-n) % _TILE_BATCH
    if pad:
        f1 = jnp.concatenate([f1, jnp.zeros((pad,) + f1.shape[1:], f1.dtype)])
        f2 = jnp.concatenate([f2, jnp.zeros((pad,) + f2.shape[1:], f2.dtype)])
    nb = f1.shape[0] // _TILE_BATCH
    a = f1.reshape((nb, _TILE_BATCH) + f1.shape[1:])
    b = f2.reshape((nb, _TILE_BATCH) + f2.shape[1:])
    merged = jax.lax.map(lambda xy: compose_flows_batched(xy[0], xy[1]), (a, b))
    merged = merged.reshape((nb * _TILE_BATCH,) + merged.shape[2:])[:n]
    return stitch_tiles(merged, grid)


@functools.partial(jax.jit, static_argnames=("grid", "dtype_name"))
def warp_tiled_dtype(image: jax.Array, flow: jax.Array, grid: TileGrid, dtype_name: str) -> jax.Array:
    """Tiled warp rounded back to an integer dtype (cv.remap rounds)."""
    out = warp_tiled(image, flow, grid)
    dt = jnp.dtype(dtype_name)
    if jnp.issubdtype(dt, jnp.integer):
        info = jnp.iinfo(dt)
        out = jnp.clip(jnp.round(out), info.min, info.max)
    return out.astype(dt)


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
