"""Windowed flow composition vs the direct per-tile reference semantics.

compose_flows_tiled now fetches each tile's f2 window displaced by the mean
interior flow so large accumulated flows stay on the banded sampler; these
tests pin equality with the direct formulation (per halo tile:
``f1 + sample(f2_tile, p + f1)`` with zeros outside the tile) across small,
large, and rough flows, including the zero-flow shortcuts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from microaligner_tpu.ops.warp import compose_flows_batched
from microaligner_tpu.optflow.warper import compose_flows_tiled
from microaligner_tpu.tiles import TileGrid, split_into_tiles, stitch_tiles


def _direct(flow1, flow2, grid):
    """The unshifted per-tile composition (previous implementation)."""
    f1 = split_into_tiles(flow1, grid)
    f2 = split_into_tiles(flow2, grid)
    return stitch_tiles(compose_flows_batched(f1, f2, band=7), grid)


def _smooth_flow(rng, h, w, mag, wavelength=60.0):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.stack(
        [
            mag * np.sin(ys / wavelength + rng.random() * 3),
            mag * np.cos(xs / wavelength + rng.random() * 3),
        ],
        axis=-1,
    ).astype(np.float32)


@pytest.mark.parametrize("mag", [1.5, 12.0, 35.0])
def test_matches_direct_semantics(rng, mag):
    h, w = 260, 300
    grid = TileGrid.for_image((h, w), 120, 40)
    f1 = jnp.asarray(_smooth_flow(rng, h, w, mag))
    f2 = jnp.asarray(_smooth_flow(rng, h, w, mag / 3))
    got = np.asarray(compose_flows_tiled(f1, f2, grid))
    want = np.asarray(_direct(f1, f2, grid))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_rough_flow_fallback_matches(rng):
    # spread larger than the band within single tiles -> exact fallback path
    h, w = 260, 300
    grid = TileGrid.for_image((h, w), 120, 40)
    f1 = jnp.asarray((rng.random((h, w, 2)).astype(np.float32) - 0.5) * 30)
    f2 = jnp.asarray(_smooth_flow(rng, h, w, 2.0))
    got = np.asarray(compose_flows_tiled(f1, f2, grid))
    want = np.asarray(_direct(f1, f2, grid))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_zero_shortcuts(rng):
    h, w = 260, 300
    grid = TileGrid.for_image((h, w), 120, 40)
    f = jnp.asarray(_smooth_flow(rng, h, w, 8.0))
    z = jnp.zeros((h, w, 2), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(compose_flows_tiled(z, f, grid)), np.asarray(f), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(compose_flows_tiled(f, z, grid)), np.asarray(f), atol=1e-5
    )


def test_extreme_spread_reverts_to_unshifted(rng):
    """Per-tile spread beyond the window margin (> overlap px): the dc-shift
    guard must revert those tiles to the unshifted window so taps inside the
    original halo extent are never lost (ADVICE round 2)."""
    h, w = 260, 300
    grid = TileGrid.for_image((h, w), 120, 40)
    # mean ~0 but deviations up to ±60 > overlap 40
    f1 = jnp.asarray((rng.random((h, w, 2)).astype(np.float32) - 0.5) * 120)
    f2 = jnp.asarray(_smooth_flow(rng, h, w, 3.0))
    got = np.asarray(compose_flows_tiled(f1, f2, grid))
    want = np.asarray(_direct(f1, f2, grid))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_extreme_spread_nonzero_mean(rng):
    """Large mean AND large spread together."""
    h, w = 260, 300
    grid = TileGrid.for_image((h, w), 120, 40)
    f1 = jnp.asarray(
        _smooth_flow(rng, h, w, 25.0)
        + (rng.random((h, w, 2)).astype(np.float32) - 0.5) * 100
    )
    f2 = jnp.asarray(_smooth_flow(rng, h, w, 2.0))
    got = np.asarray(compose_flows_tiled(f1, f2, grid))
    want = np.asarray(_direct(f1, f2, grid))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("overlap", [33, 40])
def test_nondivisible_overlap_fallback(rng, overlap):
    """overlap 33 does not divide tile 120 -> the coarse block-max shortcut is
    disabled and the unshifted-window fallback must still match the direct
    semantics (incl. zero shortcuts)."""
    h, w = 260, 300
    grid = TileGrid.for_image((h, w), 120, overlap)
    f1 = jnp.asarray(_smooth_flow(rng, h, w, 8.0))
    f2 = jnp.asarray(_smooth_flow(rng, h, w, 3.0))
    got = np.asarray(compose_flows_tiled(f1, f2, grid))
    want = np.asarray(_direct(f1, f2, grid))
    np.testing.assert_allclose(got, want, atol=1e-4)

    z = jnp.zeros((h, w, 2), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(compose_flows_tiled(z, f2, grid)), np.asarray(f2), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(compose_flows_tiled(f1, z, grid)), np.asarray(f1), atol=1e-5
    )


def test_zero_shortcut_negative_flow_tiles(rng):
    """A tile whose f1 is all-negative has max == 0 ... is False (reference
    quirk: the shortcut keys on signed max), while an all-zero f1 tile takes
    the verbatim-f2 branch; mixed canvases must still match the direct
    semantics under the coarse shortcut."""
    h, w = 260, 300
    grid = TileGrid.for_image((h, w), 120, 40)
    f1 = np.zeros((h, w, 2), np.float32)
    f1[:100, :, :] = -3.0  # negative block: NOT shortcut (signed max < 0... == 0 False)
    f2 = _smooth_flow(rng, h, w, 5.0)
    got = np.asarray(compose_flows_tiled(jnp.asarray(f1), jnp.asarray(f2), grid))
    want = np.asarray(_direct(jnp.asarray(f1), jnp.asarray(f2), grid))
    np.testing.assert_allclose(got, want, atol=1e-4)
