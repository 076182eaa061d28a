"""1-D tile mesh and shard_map helpers.

Tiles are embarrassingly parallel (each carries its own halo), so the layout
is simple: a 1-D mesh over all local devices, tile axis sharded, everything
else replicated.  The pattern generalizes to multi-host slices — the mesh
just gets bigger; collectives ride ICI.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "get_tile_mesh",
    "init_distributed_from_env",
    "shard_tiles_round_up",
    "sharded_tile_map",
]

_TILE_AXIS = "tiles"


def init_distributed_from_env() -> bool:
    """Multi-host initialization from environment variables.

    Set ``MICROALIGNER_TPU_DIST=1`` plus ``MICROALIGNER_TPU_DIST_COORD``
    (host:port), ``..._NPROC`` and ``..._PID`` before the first jax call; the
    tile mesh then spans every process's devices (``jax.devices()`` is global
    after ``jax.distributed.initialize``) and the tile axis shards across
    hosts — the "mesh just gets bigger" claim, exercised by
    tests/test_multihost.py on a 2-process CPU ring.  Returns True when
    distributed mode was initialized.
    """
    import os

    if os.environ.get("MICROALIGNER_TPU_DIST", "0") != "1":
        return False
    jax.distributed.initialize(
        coordinator_address=os.environ["MICROALIGNER_TPU_DIST_COORD"],
        num_processes=int(os.environ["MICROALIGNER_TPU_DIST_NPROC"]),
        process_id=int(os.environ["MICROALIGNER_TPU_DIST_PID"]),
    )
    return True


def get_tile_mesh(devices=None) -> Mesh:
    if devices is None:
        from microaligner_tpu.utils.workers import get_worker_devices

        devices = get_worker_devices()
    return Mesh(np.asarray(devices), (_TILE_AXIS,))


def shard_tiles_round_up(tiles: jax.Array, n_devices: int) -> jax.Array:
    """Pad the leading (tile) axis to a multiple of the device count."""
    n = tiles.shape[0]
    pad = (-n) % n_devices
    if pad:
        tiles = jnp.concatenate([tiles, jnp.zeros((pad,) + tiles.shape[1:], tiles.dtype)])
    return tiles


def sharded_tile_map(fn, mesh: Optional[Mesh] = None):
    """Lift a per-tile kernel ``fn(tile, ...) -> out`` to a sharded batch map.

    Returns a callable taking stacked tile arrays (N, ...) — N padded up to a
    multiple of the mesh size — that vmaps ``fn`` within each shard and shards
    the batch axis across the mesh.  With one device this degenerates to a
    plain vmap.
    """
    mesh = mesh if mesh is not None else get_tile_mesh()

    vf = jax.vmap(fn)
    if np.prod(mesh.devices.shape) == 1:
        return jax.jit(vf)

    spec = P(_TILE_AXIS)
    mapped = jax.shard_map(vf, mesh=mesh, in_specs=spec, out_specs=spec)

    @functools.wraps(fn)
    def run(*tile_arrays):
        n_dev = int(np.prod(mesh.devices.shape))
        padded = [shard_tiles_round_up(t, n_dev) for t in tile_arrays]
        sharding = NamedSharding(mesh, spec)
        placed = [jax.device_put(t, sharding) for t in padded]
        out = jax.jit(mapped)(*placed)
        n = tile_arrays[0].shape[0]
        return jax.tree.map(lambda o: o[:n], out)

    return run
