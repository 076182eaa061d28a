"""Mesh-sharded, memory-bounded map over the tile axis.

Every tiled op in the production engines shares one shape: split the image
into N halo tiles, run a batched per-tile kernel over the tile axis in
bounded chunks (so HBM holds one chunk's intermediates at a time), stitch the
interiors back.  ``tile_map`` lifts that pattern over the device mesh: the
tile axis is sharded with ``shard_map`` and each device runs its own bounded
``lax.map`` over its local tiles.

This is the TPU-native replacement for the reference's only parallelism — the
dask tile pool (feature_detection.py:161-168, flow_calc.py:88-98,
optflow_registrator.py:217-233, similarity_scoring.py:38-49): tiles become a
sharded leading axis, devices replace worker processes, and the stitched
result is reassembled by XLA collectives over ICI instead of pickles over
pipes.  ``NumberOfWorkers`` caps the mesh (utils/workers.py) exactly like it
capped the pool.

With a single-device mesh (the common one-chip case) the sharded wrapper is
skipped entirely, so numerics and compiled graphs are identical to the plain
bounded map.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["tile_map", "current_tile_mesh", "mesh_num_devices"]

_TILE_AXIS = "tiles"


def current_tile_mesh() -> Mesh:
    """The mesh the production engines shard tiles over: all local devices,
    capped by ``set_number_of_workers`` (the reference's NumberOfWorkers)."""
    from microaligner_tpu.parallel.mesh import get_tile_mesh

    return get_tile_mesh()


def mesh_num_devices(mesh: Optional[Mesh]) -> int:
    if mesh is None:
        return 1
    return int(np.prod(mesh.devices.shape))


def _pad_leading(arrays: Sequence[jax.Array], pad: int) -> Tuple[jax.Array, ...]:
    if pad == 0:
        return tuple(arrays)
    return tuple(
        jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        for a in arrays
    )


def tile_map(
    fn_batch: Callable,
    tile_arrays: Sequence[jax.Array],
    *,
    batch: int,
    mesh: Optional[Mesh] = None,
    broadcast: Sequence[jax.Array] = (),
    unbatched: bool = False,
):
    """Apply ``fn_batch(*chunks, *broadcast) -> pytree of (B, ...)`` over the
    leading tile axis of each input, in chunks of ``batch`` tiles, sharded
    over ``mesh``.

    * ``tile_arrays`` are ``(N, ...)`` stacks sharing the same leading length.
    * ``broadcast`` arrays are replicated to every device and passed to
      ``fn_batch`` whole (e.g. a source canvas that per-tile windows slice).
    * ``fn_batch`` sees ``(B, ...)`` slices (B = min(batch, local tile count))
      and must be shape-polymorphic only in data, not in B (it is traced once).
    * ``unbatched=True``: ``fn_batch`` is a per-tile function instead; each
      device runs a plain ``lax.map`` over its local tiles (``batch`` is
      ignored).  Use for kernels whose vmapped form compiles worse than the
      unbatched trace (e.g. per-keypoint gathers in the feature path).
    * Tiles are zero-padded up to the device and batch multiples; padded rows
      are dropped from every output, so ``fn_batch`` may produce garbage on
      all-zero tiles.
    * Must be called during a jit trace (uses sharding constraints).

    Returns a pytree of ``(N, ...)`` outputs.
    """
    tile_arrays = tuple(tile_arrays)
    broadcast = tuple(broadcast)
    n = tile_arrays[0].shape[0]
    n_dev = mesh_num_devices(mesh)
    n_tiled = len(tile_arrays)

    def local(*args):
        arrs, bcast = args[:n_tiled], args[n_tiled:]
        nloc = arrs[0].shape[0]
        if unbatched:
            return jax.lax.map(lambda ts: fn_batch(*ts, *bcast), arrs)
        b = min(batch, nloc)
        pad = (-nloc) % b
        arrs = _pad_leading(arrs, pad)
        nb = (nloc + pad) // b
        if nb == 1:
            out = fn_batch(*arrs, *bcast)
            return jax.tree.map(lambda o: o[:nloc], out)
        chunked = tuple(a.reshape((nb, b) + a.shape[1:]) for a in arrs)
        out = jax.lax.map(lambda ts: fn_batch(*ts, *bcast), chunked)
        return jax.tree.map(
            lambda o: o.reshape((nb * b,) + o.shape[2:])[:nloc], out
        )

    if n_dev <= 1:
        return local(*tile_arrays, *broadcast)

    padded = _pad_leading(tile_arrays, (-n) % n_dev)
    spec = P(_TILE_AXIS)
    sharding = NamedSharding(mesh, spec)
    placed = tuple(jax.lax.with_sharding_constraint(a, sharding) for a in padded)
    # check_vma off: per-tile kernels carry scan state that mixes replicated
    # init with shard-varying data (same reason as parallel/step.py); there
    # are no cross-shard collectives here, every output row is tile-local.
    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec,) * n_tiled + (P(),) * len(broadcast),
        out_specs=spec,
        check_vma=False,
    )
    out = sharded(*placed, *broadcast)
    return jax.tree.map(lambda o: o[:n], out)
