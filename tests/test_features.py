"""Feature engine tests: FAST goldens, DAISY properties, matching, RANSAC,
and the full FeatureRegistrator on synthetic transforms."""

import cv2 as cv
import jax.numpy as jnp
import numpy as np
import pytest

from microaligner_tpu.features import FeatureRegistrator, find_features, match_features
from microaligner_tpu.features.fast import fast_score_map, fast_detect_topk
from microaligner_tpu.features.daisy import daisy_at_points, DAISY_DIM
from microaligner_tpu.features.ransac import estimate_affine_partial_2d


def _textured(rng, h, w, sigma=1.5):
    img = cv.GaussianBlur(rng.random((h, w), dtype=np.float32), (0, 0), sigma)
    return cv.normalize(img, None, 0, 255, cv.NORM_MINMAX, cv.CV_8U)


class TestFast:
    @pytest.mark.parametrize("seed,shape", [(1, (120, 130)), (7, (200, 180))])
    def test_exact_vs_opencv(self, seed, shape):
        rng = np.random.default_rng(seed)
        img = _textured(rng, *shape)
        det = cv.FastFeatureDetector_create(
            threshold=1, nonmaxSuppression=True, type=cv.FAST_FEATURE_DETECTOR_TYPE_9_16)
        cvset = {(int(k.pt[0]), int(k.pt[1])): k.response for k in det.detect(img)}
        s = np.asarray(fast_score_map(img))
        ourset = {(x, y): float(s[y, x]) for y, x in zip(*np.nonzero(s))}
        assert set(cvset) == set(ourset)
        assert all(abs(cvset[c] - ourset[c]) < 0.5 for c in cvset)


class TestDaisy:
    def test_shape_and_determinism(self, rng):
        img = _textured(rng, 160, 150)
        pts = np.array([[60.0, 70.0], [80.5, 40.25], [30.0, 100.0]], np.float32)
        d1 = np.asarray(daisy_at_points(img.astype(np.float32), pts))
        d2 = np.asarray(daisy_at_points(img.astype(np.float32), pts))
        assert d1.shape == (3, DAISY_DIM)
        np.testing.assert_array_equal(d1, d2)
        assert np.all(d1 >= 0)  # rectified gradients stay non-negative

    def test_translation_covariance(self, rng):
        # descriptor at p in img == descriptor at p+t in translated img
        img = _textured(rng, 200, 200)
        t = 17
        shifted = np.roll(img, (t, t), axis=(0, 1))
        p = np.array([[90.0, 95.0]], np.float32)
        d0 = np.asarray(daisy_at_points(img.astype(np.float32), p))
        d1 = np.asarray(daisy_at_points(shifted.astype(np.float32), p + t))
        np.testing.assert_allclose(d0, d1, rtol=1e-4, atol=1e-4)

    def test_discriminative(self, rng):
        img = _textured(rng, 200, 200)
        pts = np.stack([rng.uniform(40, 160, 20), rng.uniform(40, 160, 20)], -1).astype(np.float32)
        d = np.asarray(daisy_at_points(img.astype(np.float32), pts))
        dist = np.linalg.norm(d[:, None] - d[None, :], axis=-1)
        off_diag = dist[~np.eye(20, dtype=bool)]
        assert off_diag.min() > 0  # distinct locations -> distinct descriptors


class TestRansac:
    def test_recovers_similarity(self, rng):
        n = 300
        src = rng.uniform(0, 1000, (n, 2)).astype(np.float32)
        ang, s, tx, ty = 0.05, 1.02, 12.0, -7.0
        a, b = s * np.cos(ang), s * np.sin(ang)
        dst = np.stack([a * src[:, 0] - b * src[:, 1] + tx,
                        b * src[:, 0] + a * src[:, 1] + ty], -1)
        dst += rng.normal(0, 0.5, dst.shape)  # inlier noise
        out = rng.choice(n, 60, replace=False)  # 20% outliers
        dst[out] += rng.uniform(-300, 300, (60, 2))
        tmat, count = estimate_affine_partial_2d(src, dst)
        theirs, _ = cv.estimateAffinePartial2D(
            src.reshape(-1, 1, 2), dst.astype(np.float32).reshape(-1, 1, 2),
            method=cv.RANSAC, confidence=0.99)
        np.testing.assert_allclose(tmat, [[a, -b, tx], [b, a, ty]], atol=0.3)
        np.testing.assert_allclose(tmat, theirs, atol=0.3)
        assert count > 200

    def test_degenerate_returns_identity(self):
        tmat, count = estimate_affine_partial_2d(np.zeros((5, 2)), np.zeros((5, 2)),
                                                 valid=np.zeros(5, bool))
        np.testing.assert_array_equal(tmat, np.eye(2, 3))
        assert count == 0


class TestFeaturePathDispatch:
    """The three find_features executions — whole-level dense (default for
    small canvases), banded per-grid-row dense (large canvases), legacy
    per-tile map (MICROALIGNER_TPU_FEATURE_DENSE=0) — share FAST semantics
    bit-exactly; descriptors may differ near tile seams (cube context) but
    matching must recover the same transform."""

    def _run(self, img, tile, mode, max_mpix=None, monkeypatch=None):
        import jax

        monkeypatch.setenv("MICROALIGNER_TPU_FEATURE_DENSE", mode)
        if max_mpix is not None:
            monkeypatch.setenv("MICROALIGNER_TPU_FEATURE_DENSE_MAX_MPIX", max_mpix)
        jax.clear_caches()
        f = find_features(img, tile)
        import jax as j

        j.block_until_ready((f.coords, f.descriptors))
        return f

    def test_three_paths_agree(self, rng, monkeypatch):
        import jax

        img = _textured(rng, 300, 320, sigma=1.5)
        t = np.float32([[1, 0, 5.0], [0, 1, -3.0]])
        mov = cv.warpAffine(img, t, (320, 300))

        dense = self._run(img, 128, "1", monkeypatch=monkeypatch)
        tiled = self._run(img, 128, "0", monkeypatch=monkeypatch)
        banded = self._run(img, 128, "auto", "0.0001", monkeypatch=monkeypatch)
        for f in (tiled, banded):
            np.testing.assert_array_equal(np.asarray(f.valid), np.asarray(dense.valid))
            np.testing.assert_array_equal(np.asarray(f.coords), np.asarray(dense.coords))
            np.testing.assert_array_equal(
                np.asarray(f.responses), np.asarray(dense.responses)
            )

        # matching recovers the same translation through every path
        for mode, mpix in (("1", None), ("0", None), ("auto", "0.0001")):
            fr = self._run(img, 128, mode, mpix, monkeypatch=monkeypatch)
            fm = self._run(mov, 128, mode, mpix, monkeypatch=monkeypatch)
            tmat = match_features(fr, fm)
            np.testing.assert_allclose(tmat[:, 2], [-5.0, 3.0], atol=0.5)
        jax.clear_caches()


class TestEndToEnd:
    def test_find_features_on_blank(self):
        f = find_features(np.zeros((200, 200), np.uint8), 1000)
        assert not f.is_valid()

    def test_match_recovers_translation(self, rng):
        ref = _textured(rng, 300, 320, sigma=2.0)
        t = np.float32([[1, 0, 6.0], [0, 1, -4.0]])
        mov = cv.warpAffine(ref, t, (320, 300))
        fr = find_features(ref, 1000)
        fm = find_features(mov, 1000)
        assert fr.is_valid() and fm.is_valid()
        tmat = match_features(fr, fm)
        # tmat maps mov -> ref: inverse of the applied forward transform
        np.testing.assert_allclose(tmat[:, 2], [-6.0, 4.0], atol=0.5)
        np.testing.assert_allclose(tmat[:2, :2], np.eye(2), atol=0.02)

    def test_registrator_recovers_rotation_translation(self, rng):
        ref = _textured(rng, 420, 440, sigma=2.0)
        fwd = cv.getRotationMatrix2D((220.0, 210.0), 1.5, 1.0)
        fwd[0, 2] += 8.0
        fwd[1, 2] -= 5.0
        mov = cv.warpAffine(ref, fwd, (440, 420))

        reg = FeatureRegistrator()
        reg.num_pyr_lvl = 1
        reg.num_iterations = 2
        reg.tile_size = 500
        reg.use_full_res_img = True
        reg.ref_img = ref
        reg.mov_img = mov
        tmat = reg.register()

        # applying tmat to mov should reproduce ref
        out = reg.transform_img(mov, tmat)
        inner = (slice(50, -50), slice(50, -50))
        before = np.mean((mov[inner].astype(float) - ref[inner].astype(float)) ** 2)
        after = np.mean((out[inner].astype(float) - ref[inner].astype(float)) ** 2)
        assert after < before * 0.1, f"before={before}, after={after}"

    def test_fused_register_matches_legacy_driver(self, rng, monkeypatch):
        """The whole-register fused program (_register_fused, one launch) must
        agree with the legacy per-level host driver it replaced; the only
        intended difference is device-f32 vs host-f64 matrix composition."""
        ref = _textured(rng, 420, 440, sigma=2.0)
        fwd = cv.getRotationMatrix2D((220.0, 210.0), 1.0, 1.0)
        fwd[0, 2] += 6.0
        fwd[1, 2] -= 4.0
        mov = cv.warpAffine(ref, fwd, (440, 420))

        def run():
            reg = FeatureRegistrator()
            reg.num_pyr_lvl = 2
            reg.num_iterations = 2
            reg.tile_size = 500
            reg.use_full_res_img = True
            reg.ref_img = ref
            reg.mov_img = mov
            return reg.register()

        monkeypatch.setenv("MICROALIGNER_TPU_FUSED_REGISTER", "1")
        fused = run()
        monkeypatch.setenv("MICROALIGNER_TPU_FUSED_REGISTER", "0")
        legacy = run()
        np.testing.assert_allclose(fused[:, :2], legacy[:, :2], atol=1e-4)
        np.testing.assert_allclose(fused[:, 2], legacy[:, 2], atol=0.05)

    def test_register_strict_parity_norm(self, rng, monkeypatch):
        """E2E in strict reference-parity descriptor mode (cv2 NRM_NONE,
        MICROALIGNER_TPU_DAISY_NRM=0) vs the unit-norm default
        (reference feature_detection.py:96-104; VERDICT r3 item 4).

        (a) Without DoG, descriptor magnitudes are comparable between ref
        and mov, so both modes recover the same transform — the unit-norm
        deviation is not a hidden divergence of the math.
        (b) With DoG, its global min-max rescale shifts raw descriptor
        magnitudes between the pair; NRM_NONE + the 0.5 ratio test then
        collapses the match count (observed equally in the cv2-FLANN
        reference reconstruction) and the MI gate safely rejects every
        iteration -> identity, while the default mode registers.  That is
        the improvement the deviation buys.
        """
        import jax

        ref = _textured(rng, 420, 440, sigma=2.0)
        fwd = cv.getRotationMatrix2D((220.0, 210.0), 1.0, 1.0)
        fwd[0, 2] += 6.0
        fwd[1, 2] -= 4.0
        mov = cv.warpAffine(ref, fwd, (440, 420))
        # register() maps mov -> ref, i.e. the inverse of the applied warp
        expect = np.linalg.inv(np.vstack([fwd, [0, 0, 1]]))[:2]

        def run(use_dog):
            # the NRM env var is read at trace time inside the fused feature
            # program, so stale jit caches must be dropped between modes
            jax.clear_caches()
            reg = FeatureRegistrator()
            reg.num_pyr_lvl = 1
            reg.num_iterations = 2
            reg.tile_size = 500
            reg.use_full_res_img = True
            reg.use_dog = use_dog
            reg.ref_img = ref
            reg.mov_img = mov
            return reg.register()

        # (a) no DoG: both modes recover the same transform
        monkeypatch.setenv("MICROALIGNER_TPU_DAISY_NRM", "0")
        strict = run(use_dog=False)
        monkeypatch.setenv("MICROALIGNER_TPU_DAISY_NRM", "1")
        default = run(use_dog=False)
        np.testing.assert_allclose(strict[:2, :2], default[:2, :2], atol=5e-3)
        np.testing.assert_allclose(strict[:, 2], default[:, 2], atol=0.5)
        for tmat in (strict, default):
            np.testing.assert_allclose(tmat[:2, :2], expect[:2, :2], atol=5e-3)
            np.testing.assert_allclose(tmat[:, 2], expect[:, 2], atol=0.5)

        # (b) with DoG: default registers; strict gate-rejects to identity
        monkeypatch.setenv("MICROALIGNER_TPU_DAISY_NRM", "0")
        strict_dog = run(use_dog=True)
        monkeypatch.setenv("MICROALIGNER_TPU_DAISY_NRM", "1")
        default_dog = run(use_dog=True)
        jax.clear_caches()
        np.testing.assert_allclose(default_dog[:, 2], expect[:, 2], atol=0.5)
        err_strict = np.abs(strict_dog - np.eye(2, 3)).max()
        err_default = np.abs(default_dog[:, 2] - expect[:, 2]).max()
        assert err_strict < 1e-6 or err_default < np.abs(
            strict_dog[:, 2] - expect[:, 2]
        ).max(), "strict mode neither safely-identity nor better than default"

    def test_too_small_for_pyramid_raises_clearly(self):
        import microaligner_tpu as ma

        img = np.full((150, 150), 128, np.uint8)
        for reg in (ma.FeatureRegistrator(), ma.OptFlowRegistrator()):
            reg.num_pyr_lvl = 2
            reg.use_full_res_img = False
            reg.ref_img = img
            reg.mov_img = img
            with pytest.raises(ValueError, match="too small for any pyramid"):
                reg.register()

    def test_validity_gates(self):
        reg = FeatureRegistrator()
        assert not reg._check_if_proper_scale(np.array([[5.0, 0, 0], [0, 5.0, 0]]))
        assert not reg._check_if_proper_scale(np.array([[0.1, 0, 0], [0, 0.1, 0]]))
        assert reg._check_if_proper_scale(np.eye(2, 3))
        assert reg._check_if_inside_borders(np.eye(2, 3), (100, 100))
        big_shift = np.array([[1.0, 0, 500.0], [0, 1.0, 0]])
        assert not reg._check_if_inside_borders(big_shift, (100, 100))


def test_fast_topk_large_tile_no_overflow():
    """TileSize >~2900 overflows the int32 composite key; the stable-sort
    fallback must return the same corners (regression for fast.py top-k)."""
    h = w = 2920  # h*w = 8.53M > 2^31 / 256
    img = np.zeros((h, w), np.uint8)
    rng = np.random.default_rng(3)
    pts = rng.integers(10, h - 10, size=(30, 2))
    for y, x in pts:
        img[y, x] = 255  # isolated bright dots = strong FAST corners
    coords, resp, valid = fast_detect_topk(jnp.asarray(img), k=40)
    coords = np.asarray(coords)[np.asarray(valid)]
    got = {(int(x), int(y)) for x, y in coords}
    want = {(int(x), int(y)) for y, x in pts}
    # every isolated dot must be found, none hallucinated
    assert want <= got
    cv_kp = cv.FastFeatureDetector.create(
        threshold=1, nonmaxSuppression=True, type=cv.FAST_FEATURE_DETECTOR_TYPE_9_16
    ).detect(img)
    cv_pts = {(int(p.pt[0]), int(p.pt[1])) for p in cv_kp}
    assert got <= cv_pts


class TestHardTransforms:
    """Combined rotation+scale+noise+intensity rescale on realistic texture:
    DAISY/knn/RANSAC must recover the ground-truth similarity and agree with
    cv.estimateAffinePartial2D on the same matched point set
    (reference compute: feature_detection.py:121-158)."""

    @pytest.mark.parametrize("angle,scale,seed", [(5.0, 1.05, 11), (-5.0, 0.95, 12), (3.0, 1.0, 13)])
    def test_rotation_scale_noise_intensity(self, angle, scale, seed):
        rng = np.random.default_rng(seed)
        # realistic texture: multi-scale blobs, not single-scale blur
        fine = cv.GaussianBlur(rng.random((460, 480), dtype=np.float32), (0, 0), 1.2)
        coarse = cv.GaussianBlur(rng.random((460, 480), dtype=np.float32), (0, 0), 6.0)
        ref = cv.normalize(fine + 2 * coarse, None, 0, 255, cv.NORM_MINMAX, cv.CV_8U)

        fwd = cv.getRotationMatrix2D((240.0, 230.0), angle, scale)
        fwd[0, 2] += 6.0
        fwd[1, 2] -= 4.0
        mov = cv.warpAffine(ref, fwd, (480, 460)).astype(np.float32)
        # intensity rescale + sensor noise on the moving image
        mov = np.clip(mov * 0.7 + 20 + rng.normal(0, 3.0, mov.shape), 0, 255).astype(np.uint8)

        fr = find_features(ref, 2000)
        fm = find_features(mov, 2000)
        assert fr.is_valid() and fm.is_valid()
        tmat = match_features(fr, fm)  # maps mov -> ref

        # ground truth inverse of the forward transform
        inv = cv.invertAffineTransform(fwd)
        np.testing.assert_allclose(tmat[:2, :2], inv[:2, :2], atol=0.02)
        # The reference detects FAST on the tile interior but computes DAISY
        # on the halo tile at interior coords (feature_detection.py:106-108),
        # so descriptors describe content 51 px up-left of each keypoint.
        # We replicate that quirk bug-for-bug; under rotation/scale it biases
        # the fitted translation by (A - I) @ (-51, -51).  Assert against the
        # quirk-adjusted expectation.
        expected = inv.copy()
        expected[:, 2] += (inv[:2, :2] - np.eye(2)) @ np.array([-51.0, -51.0])
        gy, gx = np.mgrid[0:460:20, 0:480:20].astype(np.float64)
        pts = np.stack([gx.ravel(), gy.ravel(), np.ones(gx.size)])
        disp = (tmat @ pts) - (expected @ pts)
        assert np.abs(disp).mean() < 1.5, f"mean displacement {np.abs(disp).mean():.2f}px"


        # parity with OpenCV's estimator on the SAME matched pairs
        from microaligner_tpu.features.match import match_descriptors

        good, ref_idx = match_descriptors(
            fr.descriptors, fm.descriptors, fr.valid, fm.valid
        )
        good = np.asarray(good)
        src = np.asarray(fm.coords)[good].astype(np.float32)
        dst = np.asarray(fr.coords)[np.asarray(ref_idx)][good].astype(np.float32)
        theirs, _ = cv.estimateAffinePartial2D(
            src.reshape(-1, 1, 2), dst.reshape(-1, 1, 2), method=cv.RANSAC, confidence=0.99
        )
        np.testing.assert_allclose(tmat[:2, :2], theirs[:2, :2], atol=0.02)
        disp_cv = (tmat @ pts) - (theirs @ pts)
        assert np.abs(disp_cv).mean() < 2.0, f"vs cv2: {np.abs(disp_cv).mean():.2f}px"
        # and the estimated warp must agree with the expected warp (intensity
        # was deliberately rescaled, so MSE against ref is not meaningful)
        out_est = cv.warpAffine(mov, tmat.astype(np.float32), (480, 460)).astype(float)
        out_exp = cv.warpAffine(mov, expected.astype(np.float32), (480, 460)).astype(float)
        inner = (slice(60, -60), slice(60, -60))
        mse = np.mean((out_est[inner] - out_exp[inner]) ** 2)
        assert mse < np.var(out_exp[inner]) * 0.05, f"warp mse {mse}"

