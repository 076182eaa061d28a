"""Tiled flow calc, Warper, and the full OptFlowRegistrator pipeline."""

import cv2 as cv
import numpy as np
import pytest

from microaligner_tpu.optflow import OptFlowRegistrator, TileFlowCalc, Warper


def _textured(rng, h, w, sigma=2.5):
    img = cv.GaussianBlur(rng.random((h, w), dtype=np.float32), (0, 0), sigma)
    return cv.normalize(img, None, 0, 255, cv.NORM_MINMAX, cv.CV_8U)


class TestTileFlowCalc:
    def test_whole_image_path_matches_cv(self, rng):
        ref = _textured(rng, 150, 160)
        ys, xs = np.mgrid[0:150, 0:160].astype(np.float32)
        mov = cv.remap(ref, xs + 1.5, ys - 1.0, cv.INTER_LINEAR)
        calc = TileFlowCalc()
        calc.tile_size = 1000  # max_dim/tile < 2 -> whole image
        calc.win_size = 51
        calc.num_iter = 3
        calc.ref_img = ref
        calc.mov_img = mov
        flow = calc.calc_flow()
        theirs = cv.calcOpticalFlowFarneback(
            mov, ref, None, 0.5, 0, 51, 3, 1, 1.7, cv.OPTFLOW_FARNEBACK_GAUSSIAN)
        assert np.abs(flow - theirs).mean() < 1e-3

    def test_tiled_path_matches_reference_semantics(self, rng):
        # tiled == per-tile cv farneback stitched (flow_calc.py:66-84)
        ref = _textured(rng, 260, 300)
        ys, xs = np.mgrid[0:260, 0:300].astype(np.float32)
        mov = cv.remap(ref, xs + 1.2, ys + 0.8, cv.INTER_LINEAR)
        calc = TileFlowCalc()
        calc.tile_size = 120
        calc.overlap = 40
        calc.win_size = 39
        calc.num_iter = 2
        calc.ref_img = ref
        calc.mov_img = mov
        ours = calc.calc_flow()
        assert ours.shape == (260, 300, 2)
        # recovered motion approximately (-1.2, -0.8)? flow maps mov->ref:
        # mov(p) ~ ref(p + flow) and mov = ref shifted by (+1.2, +0.8) sample
        # coords, i.e. mov(p) = ref(p + (1.2, 0.8)) -> flow ~ (1.2, 0.8)
        inner = ours[60:-60, 60:-60]
        assert abs(np.median(inner[..., 0]) - 1.2) < 0.2
        assert abs(np.median(inner[..., 1]) - 0.8) < 0.2


class TestWarper:
    def test_warp_inverts_translation(self, rng):
        img = _textured(rng, 200, 220)
        ys, xs = np.mgrid[0:200, 0:220].astype(np.float32)
        mov = cv.remap(img, xs + 3.0, ys, cv.INTER_LINEAR)  # mov(p)=img(p+3)
        flow = np.zeros((200, 220, 2), np.float32)
        flow[..., 0] = 3.0  # out(p) = mov(p - flow) = mov(p-3) = img(p)
        w = Warper()
        w.image = mov
        w.flow = flow
        out = w.warp()
        assert out.dtype == img.dtype
        inner = (slice(20, -20), slice(20, -20))
        assert np.abs(out[inner].astype(int) - img[inner].astype(int)).mean() < 2.0

    def test_matches_reference_tiled_remap(self, rng):
        img = _textured(rng, 150, 170).astype(np.float32)
        flow = (rng.random((150, 170, 2), dtype=np.float32) - 0.5) * 8
        w = Warper()
        w.tile_size = 60
        w.overlap = 20
        w.image = img.copy()
        w.flow = flow.copy()
        ours = w.warp()
        # reference semantics: per-tile remap with -flow + meshgrid, stitched
        from microaligner_tpu.tiles import TileGrid, split_into_tiles, stitch_tiles
        import jax.numpy as jnp
        grid = TileGrid.for_image(img.shape, 60, 20)
        img_t = np.asarray(split_into_tiles(jnp.asarray(img), grid))
        flow_t = np.asarray(split_into_tiles(jnp.asarray(flow), grid))
        warped = []
        for t in range(img_t.shape[0]):
            f = flow_t[t]
            h, wd = f.shape[:2]
            nf = -f.copy()
            nf[..., 0] += np.arange(wd)
            nf[..., 1] += np.arange(h).reshape(-1, 1)
            warped.append(cv.remap(img_t[t], nf, None, cv.INTER_LINEAR))
        theirs = np.asarray(stitch_tiles(jnp.asarray(np.stack(warped)), grid))
        assert np.mean((ours - theirs) ** 2) < 1.0


class TestOptFlowRegistrator:
    def test_registers_sinusoidal_warp(self, rng):
        ref = _textured(rng, 420, 440, sigma=3.0)
        ys, xs = np.mgrid[0:420, 0:440].astype(np.float32)
        mx = xs + 3.0 * np.sin(ys / 60)
        my = ys + 2.0 * np.cos(xs / 55)
        mov = cv.remap(ref, mx, my, cv.INTER_LINEAR)

        reg = OptFlowRegistrator()
        reg.num_pyr_lvl = 2
        reg.num_iterations = 3
        reg.tile_size = 220
        reg.overlap = 50
        reg.use_full_res_img = True
        reg.ref_img = ref
        reg.mov_img = mov
        flow = reg.register()
        assert flow.shape == (420, 440, 2)

        w = Warper()
        w.tile_size = 220
        w.overlap = 50
        w.image = mov
        w.flow = flow
        warped = w.warp()
        inner = (slice(40, -40), slice(40, -40))
        before = np.mean((mov[inner].astype(float) - ref[inner].astype(float)) ** 2)
        after = np.mean((warped[inner].astype(float) - ref[inner].astype(float)) ** 2)
        assert after < before * 0.25, f"before={before}, after={after}"

    def test_register_device_matches_register(self, rng):
        """register() is documented as register_device() + fetch; pin it,
        and pin warp_device() == warp() including integer round/clip and a
        device-array ref_img input (how pipeline/runner.py chains cycles)."""
        import jax
        import jax.numpy as jnp

        ref = _textured(rng, 260, 240)
        ys, xs = np.mgrid[0:260, 0:240].astype(np.float32)
        mov = cv.remap(ref, xs + 1.5, ys - 1.0, cv.INTER_LINEAR)

        def make():
            reg = OptFlowRegistrator()
            reg.num_pyr_lvl = 1
            reg.num_iterations = 2
            reg.tile_size = 130
            reg.overlap = 40
            reg.use_full_res_img = True
            return reg

        reg = make()
        reg.ref_img = ref
        reg.mov_img = mov
        host_flow = reg.register()

        reg = make()
        reg.ref_img = jnp.asarray(ref)  # device-resident ref, as in the runner
        reg.mov_img = mov
        dev_flow = reg.register_device()
        assert isinstance(dev_flow, jax.Array)
        np.testing.assert_array_equal(host_flow, np.asarray(jax.device_get(dev_flow)))

        w = Warper()
        w.tile_size = 130
        w.overlap = 40
        w.image = mov
        w.flow = host_flow
        host_warp = w.warp()
        w.image = jnp.asarray(mov)
        w.flow = dev_flow
        dev_warp = w.warp_device()
        assert dev_warp.dtype == jnp.uint8
        np.testing.assert_array_equal(host_warp, np.asarray(jax.device_get(dev_warp)))

    def test_whole_register_matches_per_level(self, rng, monkeypatch):
        """The one-launch _register_whole program equals the per-level carry
        loop (same ops, different launch granularity)."""
        ref = _textured(rng, 420, 400)
        ys, xs = np.mgrid[0:420, 0:400].astype(np.float32)
        mov = cv.remap(ref, xs + 2.0, ys - 1.5, cv.INTER_LINEAR)

        def run():
            reg = OptFlowRegistrator()
            reg.num_pyr_lvl = 1
            reg.num_iterations = 2
            reg.tile_size = 150
            reg.overlap = 40
            reg.use_full_res_img = True
            reg.ref_img = ref
            reg.mov_img = mov
            return reg.register()

        monkeypatch.setenv("MICROALIGNER_TPU_WHOLE_REGISTER", "0")
        per_level = run()
        monkeypatch.setenv("MICROALIGNER_TPU_WHOLE_REGISTER", "1")
        whole = run()
        np.testing.assert_allclose(whole, per_level, atol=1e-4)

    def test_mov_getter_fixed(self, rng):
        reg = OptFlowRegistrator()
        a = _textured(rng, 120, 120)
        b = _textured(rng, 120, 120)
        reg.ref_img = a
        reg.mov_img = b
        assert reg.mov_img is b  # reference bug (returns ref) is fixed
        assert reg.ref_img is a

    def test_rejects_3d_input(self):
        reg = OptFlowRegistrator()
        with pytest.raises(ValueError):
            reg.ref_img = np.zeros((4, 5, 3), np.uint8)


class TestFusedFlowWarp:
    """calc_flow_and_warp_tiled == calc_flow_tiled + warp_tiled_dtype."""

    @pytest.mark.parametrize("dtype", ["uint8", "uint16", "float32"])
    def test_matches_two_pass(self, rng, dtype):
        import jax.numpy as jnp

        from microaligner_tpu.optflow.flow_calc import (
            calc_flow_and_warp_tiled,
            calc_flow_tiled,
        )
        from microaligner_tpu.optflow.warper import warp_tiled_dtype
        from microaligner_tpu.tiles import TileGrid

        h, w = 260, 300
        ref = _textured(rng, h, w)
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        mov = cv.remap(ref, xs + 1.2, ys + 0.8, cv.INTER_LINEAR)
        # warp source differs from the flow pair (the registration case:
        # flow from the DoG pair, warp of the pre-DoG image)
        src = (mov.astype(np.float32) * 0.7 + 10.0).astype(dtype)
        grid = TileGrid.for_image((h, w), 120, 40)
        refj, movj, srcj = jnp.asarray(ref), jnp.asarray(mov), jnp.asarray(src)

        flow2, warped2 = calc_flow_and_warp_tiled(
            refj, movj, srcj, grid, 39, 2, dtype
        )
        flow1 = calc_flow_tiled(refj, movj, grid, 39, 2)
        warped1 = warp_tiled_dtype(srcj, flow1, grid, dtype)

        np.testing.assert_allclose(np.asarray(flow2), np.asarray(flow1), atol=1e-5)
        if dtype == "float32":
            np.testing.assert_allclose(
                np.asarray(warped2), np.asarray(warped1), atol=1e-4
            )
        else:
            # integer outputs: identical round/clip, allow 1 lsb on ties
            diff = np.abs(
                np.asarray(warped2).astype(np.int32)
                - np.asarray(warped1).astype(np.int32)
            )
            assert diff.max() <= 1
            assert (diff > 0).mean() < 1e-3

    def test_batch_knob_equality(self, rng, monkeypatch):
        import jax.numpy as jnp

        from microaligner_tpu.optflow.flow_calc import calc_flow_tiled
        from microaligner_tpu.tiles import TileGrid

        h, w = 260, 300
        ref = _textured(rng, h, w)
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        mov = cv.remap(ref, xs + 1.2, ys + 0.8, cv.INTER_LINEAR)
        grid = TileGrid.for_image((h, w), 120, 40)
        refj, movj = jnp.asarray(ref), jnp.asarray(mov)

        f_def = np.asarray(calc_flow_tiled(refj, movj, grid, 39, 2))
        monkeypatch.setenv("MICROALIGNER_TPU_FLOW_TILE_BATCH", "3")
        f_b3 = np.asarray(calc_flow_tiled(refj, movj, grid, 39, 2))
        np.testing.assert_allclose(f_b3, f_def, atol=1e-5)

    def test_static_split_equality(self, rng, monkeypatch):
        import jax.numpy as jnp

        from microaligner_tpu.optflow.flow_calc import (
            calc_flow_and_warp_tiled,
            calc_flow_tiled,
        )
        from microaligner_tpu.tiles import TileGrid

        h, w = 260, 300
        ref = _textured(rng, h, w)
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        mov = cv.remap(ref, xs + 1.2, ys + 0.8, cv.INTER_LINEAR)
        grid = TileGrid.for_image((h, w), 120, 40)
        refj, movj = jnp.asarray(ref), jnp.asarray(mov)

        f_dyn = np.asarray(calc_flow_tiled(refj, movj, grid, 39, 2))
        fw_dyn = calc_flow_and_warp_tiled(refj, movj, movj, grid, 39, 2, "uint8")
        monkeypatch.setenv("MICROALIGNER_TPU_FLOW_STATIC_SPLIT", "1")
        f_st = np.asarray(calc_flow_tiled(refj, movj, grid, 39, 2))
        fw_st = calc_flow_and_warp_tiled(refj, movj, movj, grid, 39, 2, "uint8")
        np.testing.assert_allclose(f_st, f_dyn, atol=1e-5)
        np.testing.assert_allclose(np.asarray(fw_st[0]), np.asarray(fw_dyn[0]), atol=1e-5)
        assert np.abs(
            np.asarray(fw_st[1]).astype(np.int32) - np.asarray(fw_dyn[1]).astype(np.int32)
        ).max() <= 1
