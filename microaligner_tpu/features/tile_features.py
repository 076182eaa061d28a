"""Tiled feature extraction and image-pair registration.

Mirrors the reference's tile_registration.py + feature_detection.py flow:
the image is split into tiles with a 51-px halo, FAST corners are detected on
each tile's interior view, DAISY descriptors are computed on the halo tile at
interior coords (preserving the reference's consistent sampling-offset quirk,
feature_detection.py:106-108), keypoints are shifted to global coords, and a
partial-affine transform is fit on ratio-filtered exact-knn matches.

The dask per-tile pool (feature_detection.py:161-168) becomes a tile axis
sharded over the worker mesh (bounded ``lax.map`` batches within each device
— one compiled program, bounded memory); the per-tile feature budget
``min(1_000_000 // n_tiles, 5000)`` is preserved.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from microaligner_tpu.utils.logging import log, stage_timer

from microaligner_tpu.features.daisy import daisy_at_points
from microaligner_tpu.features.fast import fast_detect_topk
from microaligner_tpu.features.match import match_descriptors
from microaligner_tpu.features.ransac import estimate_affine_partial_2d
from microaligner_tpu.tiles import TileGrid, split_into_tiles

__all__ = ["Features", "find_features", "register_img_pair", "match_features"]

_HALO = 51  # reference overlap for the feature path (tile_registration.py:33)


class Features:
    """Fixed-capacity keypoint set: coords (N, 2) [x, y] global, descriptors
    (N, D), validity mask (N,).  The analog of the reference's ``Features``
    container (feature_detection.py:27-81)."""

    def __init__(self, coords=None, descriptors=None, valid=None, responses=None):
        self.coords = coords
        self.descriptors = descriptors
        self.valid = valid
        self.responses = responses
        self._num_valid = None  # cached: one device round trip per Features

    def is_valid(self) -> bool:
        if self.coords is None or self.descriptors is None:
            return False
        return self.num_valid >= 3

    @property
    def num_valid(self) -> int:
        if self.valid is None:
            return 0
        if self._num_valid is None:
            self._num_valid = int(np.sum(np.asarray(self.valid)))
        return self._num_valid


def _find_features_tiled(img: jax.Array, grid: TileGrid, k_per_tile: int):
    from microaligner_tpu.parallel.tile_runner import current_tile_mesh

    return _find_features_tiled_jit(img, grid, k_per_tile, current_tile_mesh())


def _daisy_normalize() -> bool:
    """MICROALIGNER_TPU_DAISY_NRM=0: reference strict-parity descriptors
    (cv2 NRM_NONE, feature_detection.py:96-104).  Default 1 (unit-norm) —
    invariant to the global min-max rescale DoG applies after warps;
    tests/test_features.py::test_register_strict_parity_norm pins that both
    modes recover the same transform on clean inputs.  Read at trace time."""
    import os

    return os.environ.get("MICROALIGNER_TPU_DAISY_NRM", "1") != "0"


def _dense_level_enabled(grid: TileGrid) -> bool:
    """Whole-level dense path gate.  MICROALIGNER_TPU_FEATURE_DENSE:
    ``auto`` (default — on while the DAISY cube stack for the whole canvas
    stays HBM-friendly; larger canvases use the banded per-grid-row dense
    path), ``1`` force whole-level, ``0`` force the legacy per-tile map."""
    import os

    mode = os.environ.get("MICROALIGNER_TPU_FEATURE_DENSE", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    max_mpix = float(os.environ.get("MICROALIGNER_TPU_FEATURE_DENSE_MAX_MPIX", "26"))
    return grid.padded_h * grid.padded_w <= max_mpix * 1e6


def _per_tile_forced() -> bool:
    import os

    return os.environ.get("MICROALIGNER_TPU_FEATURE_DENSE", "auto") == "0"


@functools.partial(jax.jit, static_argnames=("grid", "k_per_tile", "mesh"))
def _find_features_tiled_jit(img: jax.Array, grid: TileGrid, k_per_tile: int, mesh):
    """Tiled FAST+DAISY feature extraction -> flat global feature arrays.

    Two executions of the same semantics:

    * DENSE (default for production level sizes): FAST runs once over the
      whole zero-padded interior canvas with per-tile frame masking + per-tile
      top-k (bit-exact with the per-tile detector), and DAISY orientation
      cubes are computed once over the halo-padded canvas with ONE fused
      multi-point gather for all keypoints.  One dense program — no serial
      per-tile ``lax.map``, the round-3 feature-path bottleneck.  Cube borders
      see real cross-tile context instead of tile-local reflections, which
      perturbs descriptors near tile seams identically for ref and mov
      (matching is unaffected; transform-level parity is what's pinned).
    * TILED (big canvases / MICROALIGNER_TPU_FEATURE_DENSE=0): the per-tile
      map over the worker mesh, bounded memory per tile.
    """
    normalize = _daisy_normalize()

    if _dense_level_enabled(grid):
        coords, desc, valid, resp = _find_features_dense(img, grid, k_per_tile, normalize)
    elif _per_tile_forced():
        coords, desc, valid, resp = _find_features_per_tile(
            img, grid, k_per_tile, mesh, normalize
        )
    else:
        coords, desc, valid, resp = _find_features_banded(
            img, grid, k_per_tile, mesh, normalize
        )

    # shift tile-local coords to global (tile_registration.py:53-66)
    tids = jnp.arange(grid.num_tiles)
    ox = (tids % grid.nx * grid.tile_w).astype(jnp.float32)
    oy = (tids // grid.nx * grid.tile_h).astype(jnp.float32)
    coords = coords + jnp.stack([ox, oy], axis=-1)[:, None, :]

    n = grid.num_tiles * k_per_tile
    return (
        coords.reshape(n, 2),
        desc.reshape(n, -1),
        valid.reshape(n),
        resp.reshape(n),
    )


def _find_features_dense(img: jax.Array, grid: TileGrid, k_per_tile: int,
                         normalize: bool):
    """Whole-level dense FAST + DAISY (one program, no per-tile loop)."""
    from microaligner_tpu.features.daisy import _gather_descriptors, _orientation_cubes
    from microaligner_tpu.features.fast import fast_detect_topk_grid

    ph, pw = grid.padded_h, grid.padded_w
    interior_canvas = jnp.pad(
        img, ((0, ph - grid.height), (0, pw - grid.width)), mode="constant"
    )
    coords, resp, valid = fast_detect_topk_grid(
        interior_canvas, grid.tile_h, grid.tile_w, k_per_tile, threshold=1
    )  # tile-local (N, k, ...)

    # DAISY cubes over the halo-padded canvas (zero halos outside the image,
    # like the per-tile slicer).  The reference samples the halo tile at
    # interior coords — a consistent (-halo, -halo) offset
    # (feature_detection.py:106-108); in canvas coordinates (= global + halo)
    # that offset cancels exactly, so sampling happens at global coords.
    halo_canvas = jnp.pad(
        img.astype(jnp.float32),
        ((_HALO, ph - grid.height + _HALO), (_HALO, pw - grid.width + _HALO)),
        mode="constant",
    )
    cubes = _orientation_cubes(halo_canvas)
    tids = jnp.arange(grid.num_tiles)
    origin = jnp.stack(
        [(tids % grid.nx) * grid.tile_w, (tids // grid.nx) * grid.tile_h], axis=-1
    ).astype(jnp.float32)
    global_coords = (coords + origin[:, None, :]).reshape(-1, 2)
    desc = _gather_descriptors(cubes, global_coords)
    if normalize:
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    return coords, desc.reshape(grid.num_tiles, k_per_tile, -1), valid, resp


def _find_features_banded(img: jax.Array, grid: TileGrid, k_per_tile: int,
                          mesh, normalize: bool):
    """Per-grid-ROW dense FAST + DAISY for canvases too big for the
    whole-level path: each band is one tile row processed with full-width
    vectorization (the block-banded blur keeps cube cost O(1) per pixel at
    any width), bounded by one band's cube stack instead of the canvas's.

    The band axis is shardable over the worker mesh exactly like the tile
    axis (tile_map over band indices with broadcast canvases), so
    ``NumberOfWorkers`` keeps meaning at 20k-class feature levels.  FAST is
    bit-exact with the per-tile detector (same frame masking, the band edges
    ARE tile boundaries); DAISY cubes see full-width context and ±halo rows
    of vertical context (band-edge clamping replaces tile-edge clamping —
    consistent for ref and mov, like the whole-level path's seam behavior).
    """
    from microaligner_tpu.features.daisy import _gather_descriptors, _orientation_cubes
    from microaligner_tpu.features.fast import fast_detect_topk_grid
    from microaligner_tpu.parallel.tile_runner import tile_map

    ph, pw = grid.padded_h, grid.padded_w
    th, tw = grid.tile_h, grid.tile_w
    interior_canvas = jnp.pad(
        img, ((0, ph - grid.height), (0, pw - grid.width)), mode="constant"
    )
    halo_canvas = jnp.pad(
        img.astype(jnp.float32),
        ((_HALO, ph - grid.height + _HALO), (_HALO, pw - grid.width + _HALO)),
        mode="constant",
    )

    def band(i, icanvas, hcanvas):
        bi = jax.lax.dynamic_slice(icanvas, (i * th, 0), (th, pw))
        coords, resp, valid = fast_detect_topk_grid(bi, th, tw, k_per_tile, threshold=1)
        bh = jax.lax.dynamic_slice(hcanvas, (i * th, 0), (th + 2 * _HALO, pw + 2 * _HALO))
        cubes = _orientation_cubes(bh)
        # sampling coords in band-halo frame: x = global x (halo offset and
        # the reference's (-halo, -halo) quirk cancel, as in the dense path),
        # y = tile-local y (the band row IS the tile row)
        ox = (jnp.arange(grid.nx) * tw).astype(jnp.float32)
        sample = coords + jnp.stack([ox, jnp.zeros_like(ox)], axis=-1)[:, None, :]
        desc = _gather_descriptors(cubes, sample.reshape(-1, 2))
        if normalize:
            desc = desc / jnp.maximum(
                jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8
            )
        return coords, desc.reshape(grid.nx, k_per_tile, -1), valid, resp

    coords, desc, valid, resp = tile_map(
        band, (jnp.arange(grid.ny),), batch=1, mesh=mesh, unbatched=True,
        broadcast=(interior_canvas, halo_canvas),
    )  # (ny, nx, k, ...)
    n = grid.num_tiles
    return (
        coords.reshape(n, k_per_tile, 2),
        desc.reshape(n, k_per_tile, -1),
        valid.reshape(n, k_per_tile),
        resp.reshape(n, k_per_tile),
    )


def _find_features_per_tile(img: jax.Array, grid: TileGrid, k_per_tile: int,
                            mesh, normalize: bool):
    """Per-tile map over the worker mesh (bounded memory for huge canvases)."""
    from microaligner_tpu.parallel.tile_runner import tile_map

    tiles = split_into_tiles(img, grid)  # (N, ts+102, ts+102)

    def per_tile(tile):
        interior = tile[_HALO:-_HALO, _HALO:-_HALO]
        coords, resp, valid = fast_detect_topk(interior, k_per_tile, threshold=1)
        # DAISY sampled on the halo tile at interior coords — the reference's
        # consistent (-51, -51) offset; cancels between ref and mov.
        desc = daisy_at_points(tile.astype(jnp.float32), coords, normalize=normalize)
        return coords, desc, valid, resp

    # unbatched map: one tile's FAST scores + DAISY orientation maps at a
    # time (a 1102^2 tile expands ~10x in the orientation stack)
    return tile_map(per_tile, (tiles,), batch=1, mesh=mesh, unbatched=True)


def find_features(img, tile_size: int) -> Features:
    """Global feature set of a 2-D image (reference tile_registration.py:78-92).

    The reference's host-side empty-image check (``img.max() == 0`` ->
    no features) is folded into the detector: FAST finds no corners on a
    constant image, so ``valid`` comes back all-False and ``is_valid()``
    yields the same identity-transform downstream path — without paying a
    device round trip here.
    """
    img = jnp.asarray(img)
    grid = TileGrid.for_image(img.shape, tile_size, _HALO)
    k = min(1_000_000 // grid.num_tiles, 5000)
    coords, desc, valid, resp = _find_features_tiled(img, grid, k)
    return Features(coords, desc, valid, resp)


@jax.jit
def _match_counts_and_pairs(ref_desc, mov_desc, ref_valid, mov_valid, ref_coords):
    """Device-side matching: good mask, per-match ref coords, and the two
    scalar counts the host needs for its branch/logging."""
    good, ref_idx = match_descriptors(ref_desc, mov_desc, ref_valid, mov_valid)
    dst = jnp.take(ref_coords, ref_idx, axis=0)
    return good, dst, jnp.sum(good), jnp.sum(mov_valid)


def match_features(ref_features: Features, mov_features: Features, seed: int = 0):
    """Transform matrix mov -> ref from matched features
    (reference feature_detection.py:121-158).

    All heavy data (descriptors, coords, match masks) stays on device; only
    two count scalars and the fitted 2x3 matrix cross to the host.
    """
    if not ref_features.is_valid() or not mov_features.is_valid():
        return np.eye(2, 3)
    good, dst, n_good_dev, n_total_dev = _match_counts_and_pairs(
        ref_features.descriptors,
        mov_features.descriptors,
        ref_features.valid,
        mov_features.valid,
        ref_features.coords,
    )
    n_good = int(jax.device_get(n_good_dev))
    log("    Good matches", n_good, "/", int(jax.device_get(n_total_dev)))
    if n_good < 3:
        return np.eye(2, 3)
    tmat, _ = estimate_affine_partial_2d(
        mov_features.coords, dst, valid=good, seed=seed, nvalid_hint=n_good
    )
    return tmat


def register_img_pair(ref_features: Features, mov_features: Features):
    return match_features(ref_features, mov_features)
