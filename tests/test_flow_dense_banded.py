"""Banded dense Farneback (full-width row bands) vs whole-image and tiled.

The banded path exists to remove the square-window halo waste at 20k scale
(flow_calc._dense_banded); these tests pin its semantics on CPU:

* one band with no halo IS the whole-image farneback (bit-exact);
* with a halo that covers the receptive field, band seams are invisible;
* the fused flow+warp variant returns the same flow plus the interior-masked
  warp (the tiled run_core construction);
* the env gate routes the public tiled entry points to the banded path;
* banded and tiled flows agree away from former tile seams.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microaligner_tpu.optflow.farneback import farneback
from microaligner_tpu.optflow.flow_calc import (
    _calc_flow_and_warp_dense_banded,
    _calc_flow_dense_banded,
    calc_flow_dense_banded,
    calc_flow_tiled,
)
from microaligner_tpu.tiles import TileGrid


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(11)
    try:
        import cv2 as cv

        base = cv.GaussianBlur(rng.random((144, 120), dtype=np.float32), (0, 0), 3.0)
        base = cv.normalize(base, None, 0, 255, cv.NORM_MINMAX, cv.CV_8U)
        ys, xs = np.mgrid[0:144, 0:120].astype(np.float32)
        mov = cv.remap(base, xs + 1.2, ys - 0.7, cv.INTER_LINEAR)
    except ImportError:  # pragma: no cover
        base = (rng.random((144, 120)) * 255).astype(np.uint8)
        mov = np.roll(base, (1, -1), axis=(0, 1))
    return jnp.asarray(base), jnp.asarray(mov)


def test_single_band_no_halo_equals_whole_image(pair):
    ref, mov = pair
    grid = TileGrid.for_image(ref.shape, 64, 0)
    flow_b = _calc_flow_dense_banded(ref, mov, grid, 19, 2, band_rows=ref.shape[0])
    flow_w = farneback(mov.astype(jnp.float32), ref.astype(jnp.float32),
                       win_size=19, num_iter=2)
    np.testing.assert_allclose(np.asarray(flow_b), np.asarray(flow_w), atol=1e-5)


def test_band_seams_invisible_when_halo_covers_receptive_field(pair):
    ref, mov = pair
    # num_iter=1 receptive field ~ win/2 + poly radius ~= 15 < overlap 20
    grid = TileGrid.for_image(ref.shape, 64, 20)
    one = _calc_flow_dense_banded(ref, mov, grid, 19, 1, band_rows=ref.shape[0])
    many = _calc_flow_dense_banded(ref, mov, grid, 19, 1, band_rows=48)
    np.testing.assert_allclose(np.asarray(many), np.asarray(one), atol=1e-3)


def test_fused_warp_matches_flow_then_manual_warp(pair):
    from microaligner_tpu.ops.warp import warp_with_flow_parts_batched

    ref, mov = pair
    grid = TileGrid.for_image(ref.shape, 64, 20)
    h, w, o = grid.height, grid.width, grid.overlap
    flow, warped = _calc_flow_and_warp_dense_banded(
        ref, mov, mov, grid, 19, 2, "uint8", band_rows=h
    )
    flow2 = _calc_flow_dense_banded(ref, mov, grid, 19, 2, band_rows=h)
    np.testing.assert_array_equal(np.asarray(flow), np.asarray(flow2))

    # reproduce the fused warp for the single-band case: halo'd source,
    # interior-masked flow, interior kept
    slab = jnp.pad(mov, ((o, o), (o, o))).astype(jnp.float32)
    fx = jnp.pad(flow[..., 0], ((o, o), (o, o)))
    fy = jnp.pad(flow[..., 1], ((o, o), (o, o)))
    exp = warp_with_flow_parts_batched(slab[None], fx[None], fy[None])[0]
    exp = jnp.clip(jnp.round(exp[o : o + h, o : o + w]), 0, 255).astype(jnp.uint8)
    np.testing.assert_array_equal(np.asarray(warped), np.asarray(exp))


def test_env_gate_routes_tiled_entry(pair, monkeypatch):
    ref, mov = pair
    grid = TileGrid.for_image(ref.shape, 64, 20)
    monkeypatch.setenv("MICROALIGNER_TPU_FLOW_DENSE", "1")
    monkeypatch.setenv("MICROALIGNER_TPU_FLOW_BAND_ROWS", "48")
    via_gate = calc_flow_tiled(ref, mov, grid, 19, 2)
    direct = calc_flow_dense_banded(ref, mov, grid, 19, 2)
    np.testing.assert_array_equal(np.asarray(via_gate), np.asarray(direct))


def test_band_axis_sharded_equals_single_device(pair):
    from microaligner_tpu.parallel.tile_runner import current_tile_mesh

    ref, mov = pair
    grid = TileGrid.for_image(ref.shape, 64, 20)
    mesh = current_tile_mesh()  # 8 virtual CPU devices under conftest
    single = _calc_flow_dense_banded(ref, mov, grid, 19, 2, band_rows=48, mesh=None)
    sharded = _calc_flow_dense_banded(ref, mov, grid, 19, 2, band_rows=48, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), atol=1e-6
    )


def test_banded_warp_equals_tiled_warp(pair):
    """For displacements within the halo the banded apply-phase warp is
    bit-identical to the tiled warp (same absolute source samples)."""
    from microaligner_tpu.optflow.warper import _warp_banded_jit, _warp_tiled_jit

    ref, mov = pair
    grid = TileGrid.for_image(ref.shape, 64, 20)
    rng = np.random.default_rng(3)
    ys, xs = np.mgrid[0 : ref.shape[0], 0 : ref.shape[1]].astype(np.float32)
    flow = jnp.asarray(
        np.stack([3.0 * np.sin(ys / 30), 2.0 * np.cos(xs / 25)], axis=-1)
    )
    img = jnp.asarray((rng.random(ref.shape) * 65535).astype(np.uint16))
    tiled = _warp_tiled_jit(img, flow, grid, "uint16", None)
    banded = _warp_banded_jit(img, flow, grid, "uint16", band_rows=48, mesh=None)
    np.testing.assert_array_equal(np.asarray(banded), np.asarray(tiled))


def test_engine_e2e_dense_gate(pair, monkeypatch):
    """OptFlowRegistrator with MICROALIGNER_TPU_FLOW_DENSE=1 registers the
    pair as well as the tiled default (warp-back MSE equivalence)."""
    from microaligner_tpu.optflow import OptFlowRegistrator, Warper

    ref, mov = pair

    def run():
        reg = OptFlowRegistrator()
        reg.num_pyr_lvl = 1
        reg.num_iterations = 2
        reg.tile_size = 64
        reg.overlap = 20
        reg.use_full_res_img = True
        reg.use_dog = False
        reg.ref_img = np.asarray(ref)
        reg.mov_img = np.asarray(mov)
        flow = reg.register()
        w = Warper()
        w.image = np.asarray(mov)
        w.flow = flow
        back = w.warp()
        inner = (slice(24, -24), slice(24, -24))
        return float(np.mean(
            (back[inner].astype(np.float32) - np.asarray(ref)[inner]) ** 2
        )) / 255.0**2

    mse_tiled = run()
    monkeypatch.setenv("MICROALIGNER_TPU_FLOW_DENSE", "1")
    monkeypatch.setenv("MICROALIGNER_TPU_FLOW_BAND_ROWS", "48")
    mse_dense = run()
    assert mse_tiled < 1e-3 and mse_dense < 1e-3, (mse_tiled, mse_dense)
    assert mse_dense < 2 * mse_tiled + 1e-6, (mse_tiled, mse_dense)


def test_banded_agrees_with_tiled_away_from_seams(pair):
    ref, mov = pair
    grid = TileGrid.for_image(ref.shape, 64, 20)
    banded = np.asarray(_calc_flow_dense_banded(ref, mov, grid, 19, 2,
                                                band_rows=ref.shape[0]))
    tiled = np.asarray(calc_flow_tiled(ref, mov, grid, 19, 2))
    # identical physics, different context truncation near tile seams: the
    # two must agree closely overall (smooth synthetic displacement)
    diff = np.abs(banded - tiled)
    assert diff.mean() < 0.05, diff.mean()
