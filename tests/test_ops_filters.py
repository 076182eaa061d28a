"""Golden tests of ops/filters.py against OpenCV."""

import cv2 as cv
import numpy as np
import pytest

from microaligner_tpu.ops import filters


def _rand_img(rng, h=96, w=80, dtype=np.uint8):
    if np.issubdtype(dtype, np.integer):
        return rng.integers(0, 256, size=(h, w)).astype(dtype)
    return rng.random((h, w), dtype=np.float32)


class TestGaussianKernel:
    @pytest.mark.parametrize("ksize,sigma", [(3, 0.8), (41, 5.0), (41, 9.0), (99, 14.7), (3, 0)])
    def test_matches_opencv(self, ksize, sigma):
        ours = filters.gaussian_kernel(ksize, sigma)
        theirs = cv.getGaussianKernel(ksize, sigma, cv.CV_32F).ravel()
        np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-6)


class TestGaussianBlur:
    @pytest.mark.parametrize("ksize,sigma", [(41, 5.0), (41, 9.0), (3, 0.8)])
    def test_matches_opencv_f32(self, rng, ksize, sigma):
        img = _rand_img(rng, dtype=np.float32)
        ours = np.asarray(filters.gaussian_blur(img, ksize, sigma))
        theirs = cv.GaussianBlur(img, (ksize, ksize), sigmaX=sigma, sigmaY=sigma)
        np.testing.assert_allclose(ours, theirs, rtol=0, atol=2e-5)


class TestGaussianBlurMXU:
    """gaussian_blur_mxu folds REFLECT_101 into dense blur operators; it must
    match cv2.GaussianBlur exactly like the slice-FMA path, including kernels
    longer than the image axis (iterated border fold)."""

    @pytest.mark.parametrize("ksize,sigma", [(29, 3.5), (63, 7.77), (41, 5.0)])
    def test_matches_opencv_f32(self, rng, ksize, sigma):
        img = _rand_img(rng, dtype=np.float32)
        ours = np.asarray(filters.gaussian_blur_mxu(img, ksize, sigma))
        theirs = cv.GaussianBlur(img, (ksize, ksize), sigmaX=sigma, sigmaY=sigma)
        np.testing.assert_allclose(ours, theirs, rtol=0, atol=2e-5)

    def test_batched_channels_first(self, rng):
        imgs = rng.random((3, 64, 72), dtype=np.float32)
        ours = np.asarray(filters.gaussian_blur_mxu(imgs, 29, 3.5))
        for c in range(3):
            theirs = cv.GaussianBlur(imgs[c], (29, 29), sigmaX=3.5, sigmaY=3.5)
            np.testing.assert_allclose(ours[c], theirs, rtol=0, atol=2e-5)

    def test_kernel_longer_than_axis(self, rng):
        img = _rand_img(rng, h=40, w=40, dtype=np.float32)
        ours = np.asarray(filters.gaussian_blur_mxu(img, 63, 7.77))
        theirs = cv.GaussianBlur(img, (63, 63), sigmaX=7.77, sigmaY=7.77)
        np.testing.assert_allclose(ours, theirs, rtol=0, atol=3e-5)


class TestMinMaxNormalize:
    def test_u8_matches_opencv(self, rng):
        img = rng.random((64, 64)).astype(np.float32) * 13 - 4
        ours = np.asarray(filters.minmax_normalize_u8(img))
        theirs = cv.normalize(img, None, 0, 255, cv.NORM_MINMAX, cv.CV_8U)
        np.testing.assert_array_equal(ours, theirs)

    def test_u8_from_u16(self, rng):
        img = rng.integers(3, 60000, size=(64, 64)).astype(np.uint16)
        ours = np.asarray(filters.minmax_normalize_u8(img))
        theirs = cv.normalize(img, None, 0, 255, cv.NORM_MINMAX, cv.CV_8U)
        # cvRound ties can differ by 1 in rare float-association cases
        assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 1

    def test_f32_matches_opencv(self, rng):
        img = rng.integers(0, 65535, size=(48, 56)).astype(np.uint16)
        ours = np.asarray(filters.minmax_normalize_f32(img))
        theirs = cv.normalize(img, None, 0, 1, cv.NORM_MINMAX, cv.CV_32F)
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


class TestDog:
    def test_matches_reference_dog(self, rng):
        img = rng.integers(0, 256, size=(120, 110)).astype(np.uint8)
        ours = np.asarray(filters.dog(img, True))
        # reference dog (feature_registrator.py:287-312) rebuilt with cv2
        fimg = cv.normalize(img, None, 0, 1, cv.NORM_MINMAX, cv.CV_32F)
        k = (41, 41)
        ls = cv.GaussianBlur(fimg, k, sigmaX=5, sigmaY=5)
        hs = cv.GaussianBlur(fimg, k, sigmaX=9, sigmaY=9)
        theirs = cv.normalize(hs - ls, None, 0, 255, cv.NORM_MINMAX, cv.CV_8U)
        assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 1
        assert (ours != theirs).mean() < 0.02

    def test_passthrough(self, rng):
        img = rng.integers(0, 256, size=(32, 32)).astype(np.uint8)
        assert filters.dog(img, False) is img
        zeros = np.zeros((32, 32), np.uint8)
        np.testing.assert_array_equal(np.asarray(filters.dog(zeros, True)), zeros)


class TestPyramids:
    @pytest.mark.parametrize("shape", [(100, 100), (101, 103), (128, 96)])
    def test_pyr_down_matches_opencv(self, rng, shape):
        img = rng.integers(0, 256, size=shape).astype(np.uint8)
        ours = np.asarray(filters.pyr_down(img))
        theirs = cv.pyrDown(img)
        assert ours.shape == theirs.shape
        assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 1
        assert (ours != theirs).mean() < 0.02

    @pytest.mark.parametrize("shape", [(100, 100), (101, 103)])
    def test_pyr_down_f32(self, rng, shape):
        img = rng.random(shape).astype(np.float32)
        ours = np.asarray(filters.pyr_down(img))
        theirs = cv.pyrDown(img)
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    @pytest.mark.parametrize(
        "src_shape,dst_shape",
        [((50, 60), (100, 120)), ((50, 60), (99, 119)), ((50, 60), (101, 121))],
    )
    def test_pyr_up_matches_opencv(self, rng, src_shape, dst_shape):
        img = rng.random(src_shape).astype(np.float32)
        ours = np.asarray(filters.pyr_up(img, dst_shape))
        theirs = cv.pyrUp(img, dstsize=dst_shape[::-1])
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_pyr_up_flow(self, rng):
        flow = rng.random((40, 50, 2)).astype(np.float32)
        ours = np.asarray(filters.pyr_up(flow, (80, 100)))
        theirs = cv.pyrUp(flow, dstsize=(100, 80))
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_banded_blur_matches_dense_operator():
    """The block-banded Toeplitz blur (long axes) must equal the dense
    blur-operator contraction it replaces — same REFLECT_101 fold, same
    kernel; only the contraction blocking differs."""
    import jax.numpy as jnp

    import microaligner_tpu.ops.filters as F

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((2, 700, 1111)).astype(np.float32))
    for ksize, sigma in ((29, 3.5), (63, 7.9)):
        got = F.gaussian_blur_mxu(x, ksize, sigma)
        old = F._BANDED_BLOCK
        try:
            F._BANDED_BLOCK = 10**6  # force the dense operator route
            want = F.gaussian_blur_mxu(x, ksize, sigma)
        finally:
            F._BANDED_BLOCK = old
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)
