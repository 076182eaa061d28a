"""Tiled Farneback flow: vmapped tile axis instead of a dask pool.

Mirrors ``TileFlowCalc`` (optflow_reg/flow_calc.py:50-98): below two tiles the
flow is computed on the whole image; otherwise both images are split into
halo-expanded tiles, flow is computed per tile in one batched XLA launch, and
tile interiors are stitched.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from microaligner_tpu.optflow.farneback import farneback, _farneback_core_batched
from microaligner_tpu.tiles import TileGrid, split_into_tiles, stitch_tiles

__all__ = ["TileFlowCalc", "calc_flow_tiled"]


@functools.partial(jax.jit, static_argnames=("grid", "win_size", "num_iter"))
def calc_flow_tiled(
    ref_img: jax.Array,
    mov_img: jax.Array,
    grid: TileGrid,
    win_size: int,
    num_iter: int,
) -> jax.Array:
    """(H, W) pair -> (H, W, 2) flow, computed per halo tile and stitched."""
    ref_tiles = split_into_tiles(ref_img.astype(jnp.float32), grid)
    mov_tiles = split_into_tiles(mov_img.astype(jnp.float32), grid)
    flow_tiles = _farneback_core_batched(mov_tiles, ref_tiles, win_size, num_iter, 1, 1.7)
    return stitch_tiles(flow_tiles, grid)


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
