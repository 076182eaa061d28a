"""Tile split/stitch parity with the reference slicer/stitcher semantics."""

import numpy as np
import pytest

from microaligner_tpu.tiles import TileGrid, split_into_tiles, stitch_tiles


def _reference_get_tile(big, hor_f, hor_t, ver_f, ver_t, overlap):
    """Reimplementation of the reference slicer semantics
    (shared_modules/slicer.py:23-66) for testing."""
    hor_f -= overlap
    hor_t += overlap
    ver_f -= overlap
    ver_t += overlap
    h, w = big.shape[:2]
    lp = max(0, -hor_f); hor_f = max(hor_f, 0)
    tp = max(0, -ver_f); ver_f = max(ver_f, 0)
    rp = max(0, hor_t - w); hor_t = min(hor_t, w)
    bp = max(0, ver_t - h); ver_t = min(ver_t, h)
    tile = big[ver_f:ver_t, hor_f:hor_t]
    pad = [(tp, bp), (lp, rp)] + [(0, 0)] * (big.ndim - 2)
    return np.pad(tile, pad, mode="constant")


@pytest.mark.parametrize("shape,tile,overlap", [
    ((100, 100), 40, 10),
    ((97, 113), 40, 10),
    ((50, 50), 60, 5),     # single tile bigger than image
    ((120, 80), 40, 0),    # no halo
])
def test_split_matches_reference(rng, shape, tile, overlap):
    img = rng.integers(0, 256, size=shape).astype(np.uint8)
    grid = TileGrid.for_image(shape, tile, overlap)
    ours = np.asarray(split_into_tiles(img, grid))
    n = 0
    for i in range(grid.ny):
        for j in range(grid.nx):
            ref = _reference_get_tile(img, j * tile, (j + 1) * tile, i * tile, (i + 1) * tile, overlap)
            np.testing.assert_array_equal(ours[n], ref)
            n += 1


@pytest.mark.parametrize("shape,tile,overlap", [
    ((100, 100), 40, 10),
    ((97, 113), 40, 10),
    ((64, 64), 100, 13),
])
def test_roundtrip(rng, shape, tile, overlap):
    img = rng.integers(0, 65535, size=shape).astype(np.uint16)
    grid = TileGrid.for_image(shape, tile, overlap)
    back = np.asarray(stitch_tiles(split_into_tiles(img, grid), grid))
    np.testing.assert_array_equal(back, img)


def test_roundtrip_flow(rng):
    flow = rng.random((90, 110, 2)).astype(np.float32)
    grid = TileGrid.for_image(flow.shape, 40, 12)
    back = np.asarray(stitch_tiles(split_into_tiles(flow, grid), grid))
    np.testing.assert_array_equal(back, flow)


def test_get_slices_paste_roundtrip(rng):
    """Pasting every tile interior via get_slices rebuilds the image exactly
    (reference stitcher.py:25-69 + :72-118 contract)."""
    from microaligner_tpu.tiles import get_slices, split_image_into_tiles_of_size

    img = rng.integers(0, 255, (97, 113)).astype(np.uint8)
    tile_w = tile_h = 40
    overlap = 10
    tiles, info = split_image_into_tiles_of_size(img, tile_w, tile_h, overlap)
    pad = info["padding"]
    canvas = np.zeros(
        (info["ntiles"]["y"] * tile_h - pad["top"] - pad["bottom"],
         info["ntiles"]["x"] * tile_w - pad["left"] - pad["right"]),
        img.dtype,
    )
    n = 0
    for i in range(info["ntiles"]["y"]):
        for j in range(info["ntiles"]["x"]):
            canvas_sl, tile_sl = get_slices(
                canvas, j * tile_w, (j + 1) * tile_w, i * tile_h, (i + 1) * tile_h,
                pad, overlap,
            )
            canvas[canvas_sl] = tiles[n][tile_sl]
            n += 1
    np.testing.assert_array_equal(canvas, img)
