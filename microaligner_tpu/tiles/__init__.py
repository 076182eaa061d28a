"""Static-shape tiling with halo overlap — the TPU analog of the reference's
slicer/stitcher (shared_modules/slicer.py, stitcher.py).

Tiles become a leading array axis (ny*nx, T, T) instead of a Python list, so
per-tile work is a ``vmap``/``shard_map`` over that axis rather than a dask
process pool (SURVEY §2.9, §5.8).
"""

from microaligner_tpu.tiles.slicer import (
    TileGrid,
    pad_canvas,
    split_interiors,
    split_into_tiles,
    stitch_interiors,
    stitch_tiles,
    tile_origins,
)
from microaligner_tpu.tiles.compat import (
    get_slices,
    get_tile,
    split_image_into_tiles_of_size,
    stitch_image,
)

__all__ = [
    "TileGrid",
    "split_into_tiles",
    "stitch_tiles",
    "pad_canvas",
    "tile_origins",
    "split_interiors",
    "stitch_interiors",
    "get_slices",
    "get_tile",
    "split_image_into_tiles_of_size",
    "stitch_image",
]
