"""One fully-sharded registration step (optical-flow path).

This is the framework's "training step" analog: given a ref/mov image pair,
compute per-tile Farneback flow, warp the moving tiles, and score the result
with an NMI joint histogram — all under one jit over a device mesh:

* tile axis sharded (data parallelism over tiles),
* the joint histogram reduced with a ``psum`` over the mesh (the collective
  rides ICI),
* stitched outputs come back tile-sharded; the host reassembles lazily.

Used by ``__graft_entry__.dryrun_multichip`` to validate multi-chip
compilation, and by the benchmark as the fused steady-state step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from microaligner_tpu.ops.mutual_info import _joint_hist_256
from microaligner_tpu.ops.warp import warp_with_flow_parts_batched
from microaligner_tpu.optflow.farneback import _farneback_core_parts
from microaligner_tpu.tiles import TileGrid, split_into_tiles, stitch_tiles

__all__ = ["make_sharded_register_step"]

_AXIS = "tiles"


def make_sharded_register_step(
    mesh: Mesh, grid: TileGrid, win_size: int, num_iter: int, with_hist: bool = True
):
    """Build a jitted step: (ref (H,W) f32, mov (H,W) f32) ->
    (warped (H,W) f32, flow (H,W,2) f32[, joint_hist (256,256) f32]).

    ``with_hist=False`` skips the NMI joint histogram — benchmarks comparing
    against the reference's flow+remap compute must not bill the TPU for a
    scoring stage the baseline doesn't run.
    """
    n_dev = int(np.prod(mesh.devices.shape))
    num_tiles = grid.num_tiles
    pad_tiles = (-num_tiles) % n_dev

    def per_shard(ref_tiles, mov_tiles):
        # ref_tiles: (n_local, T, T) on this device.  Flow channels stay
        # separate (fx, fy) through the whole hot path: a trailing stacked
        # dim of 2 forces padded T(8,128) layouts and relayout copies.
        fx, fy = _farneback_core_parts(mov_tiles, ref_tiles, win_size, num_iter, 1, 1.7)
        warped = warp_with_flow_parts_batched(mov_tiles, fx, fy)
        if not with_hist:
            return warped, fx, fy
        # NMI joint histogram of tile interiors, reduced across the mesh
        o = grid.overlap
        wi = warped[:, o : o + grid.tile_h, o : o + grid.tile_w]
        ri = ref_tiles[:, o : o + grid.tile_h, o : o + grid.tile_w]
        a = jnp.clip(ri, 0, 255).astype(jnp.int32).reshape(-1)
        b = jnp.clip(wi, 0, 255).astype(jnp.int32).reshape(-1)
        hist = _joint_hist_256(a, b)  # chunked MXU one-hot matmuls
        hist = jax.lax.psum(hist, _AXIS)
        return warped, fx, fy, hist

    out_specs = (
        (P(_AXIS), P(_AXIS), P(_AXIS), P())
        if with_hist
        else (P(_AXIS), P(_AXIS), P(_AXIS))
    )
    sharded = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(_AXIS), P(_AXIS)),
        out_specs=out_specs,
        # the scan carry in the histogram mixes replicated-init with
        # shard-varying values; that is intentional (psum follows)
        check_vma=False,
    )

    tile_sharding = NamedSharding(mesh, P(_AXIS))

    @jax.jit
    def step(ref_img, mov_img):
        ref_tiles = split_into_tiles(ref_img.astype(jnp.float32), grid)
        mov_tiles = split_into_tiles(mov_img.astype(jnp.float32), grid)
        if pad_tiles:
            z = jnp.zeros((pad_tiles,) + ref_tiles.shape[1:], ref_tiles.dtype)
            ref_tiles = jnp.concatenate([ref_tiles, z])
            mov_tiles = jnp.concatenate([mov_tiles, z])
        ref_tiles = jax.lax.with_sharding_constraint(ref_tiles, tile_sharding)
        mov_tiles = jax.lax.with_sharding_constraint(mov_tiles, tile_sharding)
        out = sharded(ref_tiles, mov_tiles)
        warped = stitch_tiles(out[0][:num_tiles], grid)
        # stitch each channel separately, stack only at the API boundary
        fx = stitch_tiles(out[1][:num_tiles], grid)
        fy = stitch_tiles(out[2][:num_tiles], grid)
        flow = jnp.stack([fx, fy], axis=-1)
        if with_hist:
            return warped, flow, out[3]
        return warped, flow

    return step
