"""Golden tests of ops/warp.py against OpenCV remap/warpAffine."""

import cv2 as cv
import numpy as np
import pytest

from microaligner_tpu.ops import warp as W


class TestBilinearRemap:
    def test_matches_cv_remap(self, rng):
        img = rng.integers(0, 256, size=(64, 72)).astype(np.uint8)
        map_x = (rng.random((64, 72), dtype=np.float32) * 80 - 4).astype(np.float32)
        map_y = (rng.random((64, 72), dtype=np.float32) * 72 - 4).astype(np.float32)
        ours = np.asarray(W.bilinear_remap(img.astype(np.float32), map_x, map_y))
        theirs = cv.remap(img.astype(np.float32), map_x, map_y, cv.INTER_LINEAR)
        # OpenCV quantizes coords to 1/32 px; bound the resulting difference
        assert np.abs(ours - theirs).max() < 256 / 32 + 1e-3
        assert np.mean((ours - theirs) ** 2) < 1.0

    def test_identity(self, rng):
        img = rng.random((32, 40)).astype(np.float32)
        gx, gy = np.meshgrid(np.arange(40, dtype=np.float32), np.arange(32, dtype=np.float32))
        out = np.asarray(W.bilinear_remap(img, gx, gy))
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_zero_outside(self):
        img = np.ones((10, 10), np.float32)
        mx = np.full((10, 10), -5.0, np.float32)
        my = np.full((10, 10), 5.0, np.float32)
        out = np.asarray(W.bilinear_remap(img, mx, my))
        assert np.all(out == 0)


class TestWarpWithFlow:
    def test_matches_reference_warper_semantics(self, rng):
        # reference: optflow_reg/warper.py:55-67 (new = -flow + meshgrid; remap)
        img = rng.integers(0, 256, size=(48, 56)).astype(np.uint8).astype(np.float32)
        flow = (rng.random((48, 56, 2), dtype=np.float32) - 0.5) * 6
        ours = np.asarray(W.warp_with_flow(img, flow))
        new_flow = np.negative(flow)
        new_flow[:, :, 0] += np.arange(56)
        new_flow[:, :, 1] += np.arange(48).reshape(-1, 1)
        theirs = cv.remap(img, new_flow, None, cv.INTER_LINEAR)
        assert np.mean((ours - theirs) ** 2) < 1.0

    def test_translation_flow(self):
        img = np.zeros((20, 20), np.float32)
        img[10, 10] = 100.0
        flow = np.zeros((20, 20, 2), np.float32)
        flow[..., 0] = 3.0  # x displacement
        out = np.asarray(W.warp_with_flow(img, flow))
        assert out[10, 13] == 100.0


class TestAffineWarp:
    @pytest.mark.parametrize("angle,scale,tx,ty", [(5.0, 1.0, 3.0, -2.0), (0.0, 1.1, 0.5, 0.5)])
    def test_matches_cv_warpaffine(self, rng, angle, scale, tx, ty):
        img = rng.integers(0, 256, size=(80, 90)).astype(np.uint8).astype(np.float32)
        t = cv.getRotationMatrix2D((45.0, 40.0), angle, scale)
        t[0, 2] += tx
        t[1, 2] += ty
        ours = np.asarray(W.affine_warp(img, t))
        theirs = cv.warpAffine(img, t, dsize=(90, 80))
        assert np.mean((ours - theirs) ** 2) < 0.5

    def test_transform_img_with_tmat_identity(self, rng):
        img = rng.integers(0, 1000, size=(30, 40)).astype(np.uint16)
        out = W.transform_img_with_tmat(img, (36, 44), np.eye(2, 3))
        assert out.shape == (36, 44)
        assert out.dtype == np.uint16
        np.testing.assert_array_equal(out[3:33, 2:42], img)

    def test_transform_img_with_tmat_translation(self, rng):
        img = rng.integers(0, 1000, size=(40, 40)).astype(np.uint16)
        t = np.array([[1.0, 0.0, 5.0], [0.0, 1.0, 0.0]])
        out = W.transform_img_with_tmat(img, (40, 40), t)
        np.testing.assert_array_equal(out[:, 5:], img[:, :-5])
        assert np.all(out[:, :5] == 0)


class TestComposeFlows:
    def test_zero_shortcircuits(self, rng):
        f = (rng.random((20, 20, 2), dtype=np.float32) - 0.2) * 3
        z = np.zeros_like(f)
        np.testing.assert_allclose(np.asarray(W.compose_flows(z, f)), f)
        np.testing.assert_allclose(np.asarray(W.compose_flows(f, z)), f)

    def test_matches_reference_merge(self, rng):
        f1 = (rng.random((30, 30, 2), dtype=np.float32) - 0.5) * 4 + 1.0
        f2 = (rng.random((30, 30, 2), dtype=np.float32) - 0.5) * 4 + 1.0
        ours = np.asarray(W.compose_flows(f1, f2))
        theirs = f1 + cv.remap(f2, -f1[..., 0] + np.arange(30)[None, :].astype(np.float32),
                               -f1[..., 1] + np.arange(30)[:, None].astype(np.float32),
                               cv.INTER_LINEAR)
        assert np.abs(ours - theirs).max() < 0.3
        assert np.mean((ours - theirs) ** 2) < 1e-3

    def test_two_translations_compose(self):
        # composing two constant translations yields their sum (away from borders)
        f1 = np.zeros((25, 25, 2), np.float32); f1[..., 0] = 2.0
        f2 = np.zeros((25, 25, 2), np.float32); f2[..., 1] = 3.0
        out = np.asarray(W.compose_flows(f1, f2))
        assert np.allclose(out[5:-5, 5:-5, 0], 2.0)
        assert np.allclose(out[5:-5, 5:-5, 1], 3.0)
