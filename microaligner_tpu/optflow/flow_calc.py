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


_TILE_BATCH = 16  # bounds live tile working set (R0/R1 are 5-channel f32)


@functools.partial(jax.jit, static_argnames=("grid", "win_size", "num_iter"))
def calc_flow_tiled(
    ref_img: jax.Array,
    mov_img: jax.Array,
    grid: TileGrid,
    win_size: int,
    num_iter: int,
) -> jax.Array:
    """(H, W) pair -> (H, W, 2) flow, computed per halo tile and stitched.

    Tiles run in fixed-size batches (lax.map) so HBM holds one batch's
    polynomial expansions at a time — a 20k x 20k image has 400 halo tiles,
    whose expansions would otherwise need ~23 GB.  Tiles keep the input dtype
    (u8 for DoG images) until inside the kernel.
    """
    ref_tiles = split_into_tiles(ref_img, grid)
    mov_tiles = split_into_tiles(mov_img, grid)
    n = ref_tiles.shape[0]
    if n <= _TILE_BATCH:
        flow_tiles = _farneback_core_batched(
            mov_tiles.astype(jnp.float32), ref_tiles.astype(jnp.float32),
            win_size, num_iter, 1, 1.7,
        )
        return stitch_tiles(flow_tiles, grid)
    pad = (-n) % _TILE_BATCH
    if pad:
        z = jnp.zeros((pad,) + ref_tiles.shape[1:], ref_tiles.dtype)
        ref_tiles = jnp.concatenate([ref_tiles, z])
        mov_tiles = jnp.concatenate([mov_tiles, z])
    nb = ref_tiles.shape[0] // _TILE_BATCH
    rt = ref_tiles.reshape((nb, _TILE_BATCH) + ref_tiles.shape[1:])
    mt = mov_tiles.reshape((nb, _TILE_BATCH) + mov_tiles.shape[1:])

    def one_chunk(mr):
        flow = _farneback_core_batched(
            mr[0].astype(jnp.float32), mr[1].astype(jnp.float32),
            win_size, num_iter, 1, 1.7,
        )
        # return x/y channels separately: a rank-5 stack with a trailing dim
        # of 2 can get a T(8,128) layout (64x padding) at 20k scale
        return flow[..., 0], flow[..., 1]

    fx, fy = jax.lax.map(one_chunk, (mt, rt))
    th, tw = grid.tile_shape
    fx = fx.reshape(nb * _TILE_BATCH, th, tw)[:n]
    fy = fy.reshape(nb * _TILE_BATCH, th, tw)[:n]
    return jnp.stack(
        [stitch_tiles(fx, grid), stitch_tiles(fy, grid)], axis=-1
    )


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
