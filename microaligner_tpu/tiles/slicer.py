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

__all__ = [
    "TileGrid",
    "split_into_tiles",
    "stitch_tiles",
    "pad_canvas",
    "tile_origins",
    "split_interiors",
    "stitch_interiors",
]


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
def pad_canvas(img: jax.Array, grid: TileGrid) -> jax.Array:
    """The zero-padded canvas every halo window slices from: image offset by
    ``overlap`` with zeros outside (exactly split_into_tiles' intermediate).

    Window i,j == ``canvas[i*tile_h : i*tile_h + win_h, j*tile_w : ...]`` —
    kept as ONE array so big-image tile ops can extract windows per bounded
    chunk (dynamic_slice block copies) instead of materializing the full
    (N, win, win) halo-duplicated stack (~3x the flow memory at 20k scale).
    """
    o = grid.overlap
    squeeze = img.ndim == 2
    x = img if not squeeze else img[..., None]
    canvas = jnp.pad(
        x,
        (
            (o, grid.padded_h - grid.height + o),
            (o, grid.padded_w - grid.width + o),
            (0, 0),
        ),
        mode="constant",
    )
    return canvas[..., 0] if squeeze else canvas


def tile_origins(grid: TileGrid) -> "np.ndarray":
    """(N, 2) int32 window origins (row, col) in pad_canvas coordinates."""
    import numpy as np

    jj, ii = np.meshgrid(np.arange(grid.nx), np.arange(grid.ny))
    return np.stack(
        [ii.ravel() * grid.tile_h, jj.ravel() * grid.tile_w], axis=-1
    ).astype(np.int32)


@functools.partial(jax.jit, static_argnames=("grid",))
def split_interiors(arr: jax.Array, grid: TileGrid) -> jax.Array:
    """``(H, W[, C]) -> (N, tile_h, tile_w[, C])`` interior tiles — a pure
    pad+reshape (no halo duplication)."""
    squeeze = arr.ndim == 2
    x = arr if not squeeze else arr[..., None]
    c = x.shape[-1]
    x = jnp.pad(
        x,
        (
            (0, grid.padded_h - grid.height),
            (0, grid.padded_w - grid.width),
            (0, 0),
        ),
    )
    x = x.reshape(grid.ny, grid.tile_h, grid.nx, grid.tile_w, c)
    x = x.transpose(0, 2, 1, 3, 4).reshape(
        grid.num_tiles, grid.tile_h, grid.tile_w, c
    )
    return x[..., 0] if squeeze else x


@functools.partial(jax.jit, static_argnames=("grid",))
def stitch_interiors(tiles: jax.Array, grid: TileGrid) -> jax.Array:
    """``(N, tile_h, tile_w[, C]) -> (H, W[, C])`` — inverse of
    ``split_interiors`` (tiles carry no halo to crop)."""
    squeeze = tiles.ndim == 3
    t = tiles if not squeeze else tiles[..., None]
    c = t.shape[-1]
    t = t.reshape(grid.ny, grid.nx, grid.tile_h, grid.tile_w, c)
    out = t.transpose(0, 2, 1, 3, 4).reshape(grid.padded_h, grid.padded_w, c)
    out = out[: grid.height, : grid.width]
    return out[..., 0] if squeeze else out


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
