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


@functools.partial(jax.jit, static_argnames=("grid",))
def warp_tiled(image: jax.Array, flow: jax.Array, grid: TileGrid) -> jax.Array:
    """Warp ``image`` (H, W) by ``flow`` (H, W, 2) tile-by-tile."""
    img_tiles = split_into_tiles(image.astype(jnp.float32), grid)
    flow_tiles = split_into_tiles(flow, grid)
    warped = warp_with_flow_batched(img_tiles, flow_tiles)
    return stitch_tiles(warped, grid)


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
