"""Split an image into a fixed grid of halo-expanded tiles and stitch back.

Semantics mirror the reference exactly (shared_modules/slicer.py:23-118,
stitcher.py:25-118):

* the grid is ``ceil(H/tile_h) x ceil(W/tile_w)``;
* every tile is the ``(tile_h, tile_w)`` interior expanded by ``overlap``
  pixels on all four sides;
* samples beyond the ORIGINAL image bounds are zero (constant padding) —
  including the implicit bottom/right grid padding;
* stitching pastes each tile's interior back and crops to the original size.

Unlike the reference (a Python list of ragged edge tiles), tiles here are one
dense array ``(ny*nx, tile_h + 2*overlap, tile_w + 2*overlap[, C])`` — a
static shape XLA can tile, vmap and shard.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

__all__ = ["TileGrid", "split_into_tiles", "stitch_tiles"]


@dataclasses.dataclass(frozen=True)
class TileGrid:
    """Static tiling descriptor (the analog of the reference's slicer ``info``)."""

    height: int
    width: int
    tile_h: int
    tile_w: int
    overlap: int

    @property
    def ny(self) -> int:
        return -(-self.height // self.tile_h)

    @property
    def nx(self) -> int:
        return -(-self.width // self.tile_w)

    @property
    def num_tiles(self) -> int:
        return self.ny * self.nx

    @property
    def padded_h(self) -> int:
        return self.ny * self.tile_h

    @property
    def padded_w(self) -> int:
        return self.nx * self.tile_w

    @property
    def tile_shape(self) -> tuple[int, int]:
        t = 2 * self.overlap
        return (self.tile_h + t, self.tile_w + t)

    @classmethod
    def for_image(cls, shape, tile_size: int, overlap: int) -> "TileGrid":
        return cls(int(shape[0]), int(shape[1]), tile_size, tile_size, overlap)


@functools.partial(jax.jit, static_argnames=("grid",))
def split_into_tiles(img: jax.Array, grid: TileGrid) -> jax.Array:
    """``(H, W[, C]) -> (ny*nx, T, T[, C])`` with zero halos outside the image."""
    o = grid.overlap
    squeeze = img.ndim == 2
    x = img if not squeeze else img[..., None]
    c = x.shape[-1]
    canvas = jnp.pad(
        x,
        (
            (o, grid.padded_h - grid.height + o),
            (o, grid.padded_w - grid.width + o),
            (0, 0),
        ),
        mode="constant",
    )
    th, tw = grid.tile_shape
    # static slices (XLA copies, not gathers — TPU gathers are slow); the
    # slice count equals the tile count, which is bounded by design
    tiles = jnp.stack(
        [
            jax.lax.slice(
                canvas,
                (i * grid.tile_h, j * grid.tile_w, 0),
                (i * grid.tile_h + th, j * grid.tile_w + tw, c),
            )
            for i in range(grid.ny)
            for j in range(grid.nx)
        ]
    )
    if squeeze:
        tiles = tiles[..., 0]
    return tiles


@functools.partial(jax.jit, static_argnames=("grid",))
def stitch_tiles(tiles: jax.Array, grid: TileGrid) -> jax.Array:
    """``(ny*nx, T, T[, C]) -> (H, W[, C])`` — paste interiors, crop to size."""
    o = grid.overlap
    squeeze = tiles.ndim == 3
    t = tiles if not squeeze else tiles[..., None]
    c = t.shape[-1]
    interior = t[:, o : o + grid.tile_h, o : o + grid.tile_w, :]
    interior = interior.reshape(grid.ny, grid.nx, grid.tile_h, grid.tile_w, c)
    out = interior.transpose(0, 2, 1, 3, 4).reshape(grid.padded_h, grid.padded_w, c)
    out = out[: grid.height, : grid.width]
    if squeeze:
        out = out[..., 0]
    return out
