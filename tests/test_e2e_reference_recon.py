"""E2E: our OptFlowRegistrator vs a cv2 reconstruction of the reference.

The reference package can't run here (dask/pint/tifffile/skimage missing), so
scripts/reference_recon.py transcribes its OptFlow pipeline onto the same
OpenCV kernels it calls, and this test drives both on one synthetic pair:
full pyramid, MI gates, tiled flow, tiled composition, upscale chain.  The
BASELINE.md bar is warped-plane MSE < 1e-3 (unit range).

Composition note: the reconstruction uses the *intended* flow composition
(meshgrid - flow1); the reference's verbatim merge passes -flow1 as an
absolute map (missing meshgrid, optflow_registrator.py:45) — a defect we fix,
exercised separately below.
"""

import os
import sys

import cv2 as cv
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import reference_recon as recon

from microaligner_tpu.optflow import OptFlowRegistrator


def _pair(rng, h, w):
    base = cv.GaussianBlur(rng.random((h, w), dtype=np.float32), (0, 0), 3.0)
    base = cv.normalize(base, None, 0, 255, cv.NORM_MINMAX, cv.CV_8U)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    mov = cv.remap(
        base, xs + 1.5 * np.sin(ys / 40), ys + 1.2 * np.cos(xs / 35), cv.INTER_LINEAR
    )
    return base, mov


class TestE2EVsReferenceRecon:
    def test_full_pyramid_chain(self, rng):
        h, w = 420, 460
        ref, mov = _pair(rng, h, w)
        kw = dict(num_pyr_lvl=2, num_iterations=2, tile_size=150, overlap=50)

        r = recon.OptFlowRegistratorRecon()
        for k, v in kw.items():
            setattr(r, k, v)
        r.use_full_res_img = True
        r.ref_img = ref
        r.mov_img = mov
        flow_ref = r.register()

        ours = OptFlowRegistrator()
        for k, v in kw.items():
            setattr(ours, k, v)
        ours.use_full_res_img = True
        ours.ref_img = ref
        ours.mov_img = mov
        flow_ours = ours.register()

        assert flow_ours.shape == flow_ref.shape
        # warped outputs must agree to the BASELINE bar (unit range MSE)
        warp_ref = recon.warp_tiled(mov.astype(np.float32), flow_ref, 150, 50)
        warp_ours = recon.warp_tiled(mov.astype(np.float32), flow_ours, 150, 50)
        mse = float(np.mean(((warp_ref - warp_ours) / 255.0) ** 2))
        assert mse < 1e-3, mse
        # and the flows themselves should be close over the interior
        d = np.abs(flow_ours - flow_ref)[30:-30, 30:-30]
        assert d.mean() < 0.05, d.mean()

    def test_recon_merge_bug_variant_differs(self, rng):
        # sanity: the faithful-bug composition is NOT what anyone should match
        f1 = rng.standard_normal((64, 64, 2)).astype(np.float32)
        f2 = rng.standard_normal((64, 64, 2)).astype(np.float32)
        good = recon.merge_two_flows(f1, f2, faithful_bugs=False)
        bad = recon.merge_two_flows(f1, f2, faithful_bugs=True)
        assert np.abs(good - bad).max() > 0.1
