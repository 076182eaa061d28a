"""Device-mesh tile parallelism.

The reference's only parallelism is a single-host dask process pool over
image tiles (SURVEY §2.9).  The TPU-native equivalent: tiles are a leading
array axis sharded across a 1-D ``jax.sharding.Mesh``; per-tile kernels run
under ``shard_map`` and stitching happens on the host after an implicit
all-gather of the sharded outputs.  Halos come free from overlapped slicing,
so no neighbor exchange is needed inside the step.
"""

from microaligner_tpu.parallel.mesh import (
    get_tile_mesh,
    sharded_tile_map,
    shard_tiles_round_up,
)
from microaligner_tpu.parallel.tile_runner import current_tile_mesh, tile_map

__all__ = [
    "get_tile_mesh",
    "sharded_tile_map",
    "shard_tiles_round_up",
    "current_tile_mesh",
    "tile_map",
]
