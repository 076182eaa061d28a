"""Gather-free tiled affine warp vs the exact gather path and cv2 goldens."""

import cv2 as cv
import numpy as np
import pytest

import jax.numpy as jnp

from microaligner_tpu.ops.affine_tiled import affine_warp_tiled, plan_affine_tiled
from microaligner_tpu.ops.warp import _affine_warp_core, affine_warp


def _textured(rng, h, w, sigma=2.0):
    img = cv.GaussianBlur(rng.random((h, w), dtype=np.float32), (0, 0), sigma)
    return cv.normalize(img, None, 0, 255, cv.NORM_MINMAX).astype(np.float32)


def _inv_of(t_mat):
    hom = np.vstack([np.asarray(t_mat, np.float64), [0, 0, 1.0]])
    return np.linalg.pinv(hom)[:2]


class TestPlan:
    def test_near_identity_plans(self):
        t = np.array([[1.001, 0.0005, 12.3], [-0.0005, 1.001, -40.7]])
        plan = plan_affine_tiled(_inv_of(t), 1200, 1400)
        assert plan is not None
        assert plan.grid.num_tiles >= 4

    def test_strong_rotation_falls_back(self):
        a = np.deg2rad(15.0)
        t = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0]])
        assert plan_affine_tiled(_inv_of(t), 1200, 1400) is None

    def test_small_images_fall_back(self):
        t = np.eye(2, 3)
        assert plan_affine_tiled(_inv_of(t), 128, 128) is None


class TestTiledAffineCorrectness:
    @pytest.mark.parametrize(
        "t_mat",
        [
            np.array([[1.0, 0.0, 17.0], [0.0, 1.0, -23.0]]),  # pure translation
            np.array([[1.002, 0.0008, -6.4], [-0.0008, 1.002, 9.1]]),  # sim
            np.array([[0.998, -0.0012, 140.2], [0.0012, 0.998, -77.5]]),  # big t
        ],
    )
    def test_matches_exact_gather(self, rng, t_mat):
        h, w = 700, 800
        img = _textured(rng, h, w)
        inv = _inv_of(t_mat)
        tiled = affine_warp_tiled(jnp.asarray(img), inv, h, w)
        assert tiled is not None
        exact = _affine_warp_core(jnp.asarray(img), jnp.asarray(inv, jnp.float32), h, w)
        # identical sampling semantics; differences are f32 coordinate noise
        assert np.abs(np.asarray(tiled) - np.asarray(exact)).max() < 0.05
        mse = float(np.mean((np.asarray(tiled) - np.asarray(exact)) ** 2))
        assert mse < 1e-6

    def test_matches_cv2_golden(self, rng):
        h, w = 600, 640
        img = _textured(rng, h, w)
        t_mat = np.array([[1.001, 0.0006, 8.25], [-0.0006, 1.001, -15.75]])
        ours = np.asarray(affine_warp(jnp.asarray(img), t_mat))
        theirs = cv.warpAffine(img, t_mat.astype(np.float32), (w, h))
        # interior only: cv2 uses 1/32-px fixed point; border blend identical
        mse = float(np.mean((ours[8:-8, 8:-8] - theirs[8:-8, 8:-8]) ** 2))
        assert mse < 1e-3

    def test_zero_outside_semantics(self, rng):
        # large translation pulls zeros into the frame; must match the gather
        h, w = 500, 520
        img = _textured(rng, h, w)
        t_mat = np.array([[1.0, 0.0, 300.0], [0.0, 1.0, -210.0]])
        inv = _inv_of(t_mat)
        tiled = affine_warp_tiled(jnp.asarray(img), inv, h, w)
        assert tiled is not None
        exact = _affine_warp_core(jnp.asarray(img), jnp.asarray(inv, jnp.float32), h, w)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(exact), atol=0.05)


class TestAffineWarpTraced:
    """affine_warp_traced: fully-traced matrix, runtime banded/gather choice."""

    def _host_reference(self, img, fwd):
        import jax.numpy as jnp
        from microaligner_tpu.ops.warp import affine_warp

        return np.asarray(affine_warp(jnp.asarray(img, jnp.float32), fwd))

    def test_near_identity_matches_host_path(self, rng):
        import jax, jax.numpy as jnp
        from microaligner_tpu.ops.affine_tiled import affine_warp_traced

        img = rng.random((300, 280)).astype(np.float32) * 255
        fwd = np.float32([[1.0004, 0.0003, 6.4], [-0.0003, 1.0004, -9.1]])
        got = np.asarray(jax.jit(affine_warp_traced)(jnp.asarray(img), jnp.asarray(fwd)))
        want = self._host_reference(img, fwd)
        # traced path inverts the matrix in f32 (the host path uses f64);
        # ~1e-7 relative coordinate error -> ~1e-4 relative value error
        assert np.max(np.abs(got - want)) < 255 * 1e-4

    def test_strong_rotation_takes_gather_branch(self, rng):
        import jax, jax.numpy as jnp
        from microaligner_tpu.ops.affine_tiled import affine_warp_traced

        img = rng.random((300, 280)).astype(np.float32) * 255
        th = 0.3
        fwd = np.float32([[np.cos(th), -np.sin(th), 10.0], [np.sin(th), np.cos(th), 5.0]])
        got = np.asarray(jax.jit(affine_warp_traced)(jnp.asarray(img), jnp.asarray(fwd)))
        want = self._host_reference(img, fwd)
        assert np.max(np.abs(got - want)) < 255 * 1e-4  # f32 vs f64 inverse

    def test_identity_is_exact(self, rng):
        import jax, jax.numpy as jnp
        from microaligner_tpu.ops.affine_tiled import affine_warp_traced

        img = rng.random((300, 300)).astype(np.float32)
        got = np.asarray(jax.jit(affine_warp_traced)(jnp.asarray(img), jnp.eye(2, 3, dtype=np.float32)))
        np.testing.assert_allclose(got, img, atol=1e-6)

    def test_small_image_gather_only(self, rng):
        import jax, jax.numpy as jnp
        from microaligner_tpu.ops.affine_tiled import affine_warp_traced

        img = rng.random((64, 64)).astype(np.float32)
        fwd = np.float32([[1.0, 0.0, 2.5], [0.0, 1.0, -1.5]])
        got = np.asarray(jax.jit(affine_warp_traced)(jnp.asarray(img), jnp.asarray(fwd)))
        want = self._host_reference(img, fwd)
        assert np.max(np.abs(got - want)) < 1e-4
