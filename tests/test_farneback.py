"""Calibration tests: our Farneback vs cv2.calcOpticalFlowFarneback."""

import cv2 as cv
import numpy as np
import pytest

from microaligner_tpu.optflow.farneback import farneback


def _cv_farneback(mov, ref, win_size, num_iter):
    # exactly the reference call (optflow_reg/flow_calc.py:33-44)
    return cv.calcOpticalFlowFarneback(
        mov, ref, None,
        pyr_scale=0.5, levels=0, winsize=win_size, iterations=num_iter,
        poly_n=1, poly_sigma=1.7, flags=cv.OPTFLOW_FARNEBACK_GAUSSIAN,
    )


def _shifted_pair(rng, h=160, w=180, dx=1.5, dy=-1.0):
    base = rng.random((h + 40, w + 40), dtype=np.float32)
    base = cv.GaussianBlur(base, (0, 0), 3.0)
    base = cv.normalize(base, None, 0, 255, cv.NORM_MINMAX, cv.CV_8U)
    m = np.float32([[1, 0, -dx], [0, 1, -dy]])
    shifted = cv.warpAffine(base, m, (w + 40, h + 40))
    ref = base[20 : 20 + h, 20 : 20 + w]
    mov = shifted[20 : 20 + h, 20 : 20 + w]
    return mov, ref


class TestFarnebackVsOpenCV:
    @pytest.mark.parametrize("num_iter", [1, 3])
    def test_matches_cv_random_texture(self, rng, num_iter):
        mov, ref = _shifted_pair(rng)
        ours = np.asarray(farneback(mov, ref, win_size=51, num_iter=num_iter))
        theirs = _cv_farneback(mov, ref, 51, num_iter)
        err = np.abs(ours - theirs)
        assert err.mean() < 1e-3, f"mean abs err {err.mean()}"
        assert err.max() < 0.05, f"max abs err {err.max()}"

    def test_recovers_translation(self, rng):
        mov, ref = _shifted_pair(rng, dx=2.0, dy=1.0)
        ours = np.asarray(farneback(mov, ref, win_size=51, num_iter=3))
        inner = ours[40:-40, 40:-40]
        assert abs(np.median(inner[..., 0]) - 2.0) < 0.3
        assert abs(np.median(inner[..., 1]) - 1.0) < 0.3

    def test_zero_motion(self, rng):
        img = (rng.random((120, 130)) * 255).astype(np.uint8)
        ours = np.asarray(farneback(img, img, win_size=51, num_iter=1))
        theirs = _cv_farneback(img, img, 51, 1)
        # both are ~0 (border pixels carry O(1e-2) numerical noise through the
        # 1e-3-regularized solve); assert sub-pixel-noise magnitude
        assert np.abs(ours).max() < 0.05
        assert np.abs(ours - theirs).max() < 0.05
