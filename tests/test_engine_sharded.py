"""Production engines over the device mesh: 1-device vs 8-device equality.

The reference's dask tile pool (feature_detection.py:161-168,
flow_calc.py:88-98, optflow_registrator.py:217-233) maps to a shard_map'd
tile axis here; these tests pin that the *engines* — not just the demo step —
produce identical results whether the worker mesh has 1 or 8 devices, so
``NumberOfWorkers`` is a real knob.
"""

import cv2 as cv
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from microaligner_tpu.utils.workers import set_number_of_workers


def _textured(rng, h, w, sigma=2.5):
    img = cv.GaussianBlur(rng.random((h, w), dtype=np.float32), (0, 0), sigma)
    return cv.normalize(img, None, 0, 255, cv.NORM_MINMAX, cv.CV_8U)


@pytest.fixture
def workers():
    """Set the worker cap for a test; restore the all-devices default after."""
    yield set_number_of_workers
    set_number_of_workers(0)


def _flow_pair(rng, h=260, w=300):
    ref = _textured(rng, h, w)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    mov = cv.remap(ref, xs + 1.2, ys + 0.8, cv.INTER_LINEAR)
    return ref, mov


class TestTiledOpsShardedEquality:
    def test_calc_flow_tiled(self, workers, rng):
        from microaligner_tpu.optflow.flow_calc import calc_flow_tiled
        from microaligner_tpu.tiles import TileGrid

        ref, mov = _flow_pair(rng)
        grid = TileGrid.for_image(ref.shape, 120, 40)
        refj, movj = jnp.asarray(ref), jnp.asarray(mov)

        workers(1)
        f1 = np.asarray(calc_flow_tiled(refj, movj, grid, 39, 2))
        workers(8)
        f8 = np.asarray(calc_flow_tiled(refj, movj, grid, 39, 2))
        np.testing.assert_allclose(f8, f1, atol=1e-5)

    def test_warp_and_compose_tiled(self, workers, rng):
        from microaligner_tpu.optflow.warper import compose_flows_tiled, warp_tiled
        from microaligner_tpu.tiles import TileGrid

        h, w = 260, 300
        img = jnp.asarray(_textured(rng, h, w))
        flow = jnp.asarray(
            np.stack(
                [
                    2.0 * np.sin(np.mgrid[0:h, 0:w][0] / 40.0),
                    1.5 * np.cos(np.mgrid[0:h, 0:w][1] / 35.0),
                ],
                axis=-1,
            ).astype(np.float32)
        )
        grid = TileGrid.for_image((h, w), 120, 40)

        workers(1)
        w1 = np.asarray(warp_tiled(img, flow, grid))
        c1 = np.asarray(compose_flows_tiled(flow, flow * 0.5, grid))
        workers(8)
        w8 = np.asarray(warp_tiled(img, flow, grid))
        c8 = np.asarray(compose_flows_tiled(flow, flow * 0.5, grid))
        np.testing.assert_allclose(w8, w1, atol=1e-5)
        np.testing.assert_allclose(c8, c1, atol=1e-5)

    def test_find_features(self, workers, rng):
        from microaligner_tpu.features.tile_features import find_features

        img = _textured(rng, 300, 320, sigma=1.5)

        workers(1)
        f1 = find_features(img, 128)
        workers(8)
        f8 = find_features(img, 128)
        np.testing.assert_array_equal(np.asarray(f8.valid), np.asarray(f1.valid))
        np.testing.assert_allclose(np.asarray(f8.coords), np.asarray(f1.coords), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(f8.descriptors), np.asarray(f1.descriptors), atol=1e-4
        )


class TestEnginesShardedEquality:
    def test_optflow_registrator(self, workers, rng):
        from microaligner_tpu.optflow import OptFlowRegistrator

        ref, mov = _flow_pair(rng)

        def run():
            reg = OptFlowRegistrator()
            reg.num_pyr_lvl = 1
            reg.num_iterations = 2
            reg.tile_size = 120
            reg.overlap = 40
            reg.use_full_res_img = True
            reg.ref_img = ref
            reg.mov_img = mov
            return reg.register()

        workers(1)
        flow1 = run()
        workers(8)
        flow8 = run()
        np.testing.assert_allclose(flow8, flow1, atol=1e-4)

    def test_feature_registrator(self, workers, rng):
        # tile_size covers the image (1 tile): multi-tile sharded detection is
        # covered by test_find_features; multi-tile matching would put a
        # 45k x 45k knn matmul on this 1-core CPU host (the per-tile budget is
        # 5000 keypoints regardless of content)
        from microaligner_tpu.features import FeatureRegistrator

        ref = _textured(rng, 300, 320, sigma=1.5)
        t = np.float32([[1, 0, 4.0], [0, 1, -3.0]])
        mov = cv.warpAffine(ref, t, (320, 300))

        def run():
            reg = FeatureRegistrator()
            reg.num_pyr_lvl = 1
            reg.num_iterations = 1
            reg.tile_size = 1000
            reg.use_full_res_img = True
            reg.ref_img = ref
            reg.mov_img = mov
            return reg.register()

        workers(1)
        m1 = run()
        workers(2)
        m8 = run()
        np.testing.assert_allclose(m8, m1, atol=1e-3)
        # and the recovered translation is the ground truth (mov -> ref: -t)
        assert abs(m8[0, 2] - (-4.0)) < 0.5
        assert abs(m8[1, 2] - 3.0) < 0.5


class TestFusedFlowWarpSharded:
    def test_calc_flow_and_warp_tiled(self, workers, rng):
        from microaligner_tpu.optflow.flow_calc import calc_flow_and_warp_tiled
        from microaligner_tpu.tiles import TileGrid

        ref, mov = _flow_pair(rng)
        grid = TileGrid.for_image(ref.shape, 120, 40)
        refj, movj = jnp.asarray(ref), jnp.asarray(mov)

        workers(1)
        f1, w1 = calc_flow_and_warp_tiled(refj, movj, movj, grid, 39, 2, "uint8")
        f1, w1 = np.asarray(f1), np.asarray(w1)
        workers(8)
        f8, w8 = calc_flow_and_warp_tiled(refj, movj, movj, grid, 39, 2, "uint8")
        np.testing.assert_allclose(np.asarray(f8), f1, atol=1e-5)
        assert np.abs(np.asarray(w8).astype(np.int32) - w1.astype(np.int32)).max() <= 1
