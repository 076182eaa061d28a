"""FeatureRegistrator — multi-scale iterative affine registration.

Faithful re-design of the reference driver
(feature_reg/feature_registrator.py:36-312): Gaussian pyramid
(coarse-to-fine, factors like [8, 4, 2]), cached reference-pyramid features,
per-level iterative alignment with an NMI gate and transform-validity checks
(scale bounds via QR-style decomposition, transformed center inside borders),
homogeneous matrix composition with translation rescaling across levels.

Host control flow drives device compute: gates are host scalars, dense work
(FAST/DAISY/knn/RANSAC/warps/MI) is XLA.
"""

from __future__ import annotations

import functools
from typing import List, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from microaligner_tpu.utils.logging import log, stage_timer

from microaligner_tpu.features.tile_features import Features, find_features, register_img_pair
from microaligner_tpu.ops.filters import dog as _dog
from microaligner_tpu.ops.filters import dog_traced, pyr_down
from microaligner_tpu.ops.mutual_info import check_if_higher_similarity, mi_tiled_traced
from microaligner_tpu.ops.warp import affine_warp
from microaligner_tpu.utils.img_checks import (
    check_img_dims_match,
    check_img_is_2d_grey,
    check_img_is_provided,
)

__all__ = ["FeatureRegistrator"]


@functools.partial(jax.jit, static_argnames=("dtype_name",))
def _cast_like(out: jax.Array, dtype_name: str) -> jax.Array:
    dt = jnp.dtype(dtype_name)
    if jnp.issubdtype(dt, jnp.integer):
        info = jnp.iinfo(dt)
        out = jnp.clip(jnp.round(out), info.min, info.max)
    return out.astype(dt)


@functools.partial(jax.jit, static_argnames=("n_lvl",))
def _pyr_chain(img: jax.Array, n_lvl: int):
    """All ``n_lvl`` pyrDown levels in one launch, finest-to-coarsest order."""
    levels = []
    cur = img
    for _ in range(n_lvl):
        cur = pyr_down(cur)
        levels.append(cur)
    return tuple(levels)


@functools.partial(jax.jit, static_argnames=("tile_size",))
def _mi_gate_pair(ref_img, new_img, prev_img, tile_size):
    """Both NMI gate scores in one launch; only two scalars reach the host."""
    rd = dog_traced(ref_img, True)
    after = mi_tiled_traced(rd, dog_traced(new_img, True), tile_size)
    before = mi_tiled_traced(rd, dog_traced(prev_img, True), tile_size)
    return after, before


def _valid_transform_traced(est3: jax.Array, img_shape) -> jax.Array:
    """Traced analog of the host validity gates: scale in [0.3, 3] via the
    2-D decomposition (feature_registrator.py:240-266) and transformed image
    center inside the borders (:268-278)."""
    aa, bb = est3[0, 0], est3[1, 0]
    cc, dd = est3[0, 1], est3[1, 1]
    det = aa * dd - bb * cc
    n1 = aa * aa + bb * bb
    n2 = cc * cc + dd * dd
    r = jnp.sqrt(jnp.maximum(n1, 1e-30))
    s = jnp.sqrt(jnp.maximum(n2, 1e-30))
    s1 = jnp.where(n1 > 0, r, det / s)
    s2 = jnp.where(n1 > 0, det / r, s)
    ok_scale = (
        ((n1 > 0) | (n2 > 0))
        & (jnp.abs(s1) >= 0.3) & (jnp.abs(s1) <= 3.0)
        & (jnp.abs(s2) >= 0.3) & (jnp.abs(s2) <= 3.0)
    )
    cy, cx = img_shape[0] // 2, img_shape[1] // 2
    center = est3 @ jnp.asarray([cx, cy, 1.0], jnp.float32)
    border = jnp.asarray([img_shape[1], img_shape[0], 1.0], jnp.float32)
    ok_border = ~jnp.any(border - jnp.abs(center) < 0)
    return ok_scale & ok_border


def _level_align_body(
    ref_img, ref_coords, ref_desc, ref_valid, mov_img,
    grid, k, tile_size, num_iterations, use_dog, mesh, dtype_name,
):
    """Traced body of one pyramid level's FULL iterative alignment.

    The reference's per-iteration chain (find -> match -> RANSAC fit -> warp
    -> MI gate -> accept/reject, feature_registrator.py:162-192) runs as
    separate host-driven dispatches; over the tunneled dev backend each launch
    costs 25-70 ms, so 3 iterations x 5 launches dominate wall time.  Here the
    whole loop is traced with the accept/reject decision carried on device
    (``jnp.where`` on the composed homogeneous matrix), and only the final
    matrix plus per-iteration diagnostic scalars reach the host.

    Returns (composed 2x3 f32, aligned image, diag (num_iterations, 5))
    with diag rows [n_good, n_total, mi_after, mi_before, accepted].
    """
    from microaligner_tpu.features.ransac import _NUM_HYPOTHESES, _ransac_core
    from microaligner_tpu.features.match import match_descriptors
    from microaligner_tpu.features.tile_features import _find_features_tiled_jit
    from microaligner_tpu.ops.affine_tiled import affine_warp_traced

    eye3 = jnp.eye(3, dtype=jnp.float32)
    mov0 = mov_img
    ref_gate_dog = dog_traced(ref_img, True)  # the MI gate always DoGs

    # lax.scan over iterations: the body is shape-uniform, so XLA compiles it
    # ONCE instead of ``num_iterations`` times — the unrolled version of this
    # loop dominated the whole-register program's compile time (~3x).
    def step(carry, _):
        composed, aligned = carry
        det_in = dog_traced(aligned, use_dog)
        coords, desc, valid, _resp = _find_features_tiled_jit(det_in, grid, k, mesh)
        good, ref_idx = match_descriptors(ref_desc, desc, ref_valid, valid)
        dst = jnp.take(ref_coords, ref_idx, axis=0)
        n_good = jnp.sum(good)
        params, _cnt = _ransac_core(
            coords.astype(jnp.float32), dst.astype(jnp.float32), good,
            jax.random.PRNGKey(0), _NUM_HYPOTHESES,
        )
        a, b, tx, ty = params[0], params[1], params[2], params[3]
        est = jnp.stack([
            jnp.stack([a, -b, tx]),
            jnp.stack([b, a, ty]),
            jnp.stack([jnp.zeros_like(a), jnp.zeros_like(a), jnp.ones_like(a)]),
        ])
        est = jnp.where(n_good >= 3, est, eye3)

        # candidate = est applied to the CURRENT aligned image (host parity:
        # _align_imgs warps the running image, the accepted realign below
        # restarts from the ORIGINAL mov with the composed matrix)
        cand = _cast_like(affine_warp_traced(aligned.astype(jnp.float32), est[:2]), dtype_name)
        after = mi_tiled_traced(ref_gate_dog, dog_traced(cand, True), tile_size)
        before = mi_tiled_traced(ref_gate_dog, dog_traced(aligned, True), tile_size)
        accept = (after > before) & _valid_transform_traced(est, mov_img.shape)

        composed = jnp.where(accept, composed @ est, composed)
        realigned = _cast_like(
            affine_warp_traced(mov0.astype(jnp.float32), composed[:2]), dtype_name
        )
        aligned = jnp.where(accept, realigned, aligned)
        diag_row = jnp.stack([
            n_good.astype(jnp.float32),
            jnp.sum(valid).astype(jnp.float32),
            after, before,
            accept.astype(jnp.float32),
        ])
        return (composed, aligned), diag_row

    (composed, aligned), diag = jax.lax.scan(
        step, (eye3, mov_img), None, length=num_iterations
    )
    return composed[:2], aligned, diag


_level_align_fused = functools.partial(
    jax.jit,
    static_argnames=("grid", "k", "tile_size", "num_iterations", "use_dog",
                     "mesh", "dtype_name"),
)(_level_align_body)


def _build_pyr_levels(img: jax.Array, factors) -> list:
    """Pyramid levels for a descending ``factors`` tuple (e.g. (8, 4, 2) or
    (8, 4, 2, 1)), smallest level first; a trailing factor 1 is the original
    image (``use_full_res_img``)."""
    n_down = sum(1 for f in factors if f > 1)
    chain = []
    cur = img
    for _ in range(n_down):
        cur = pyr_down(cur)
        chain.append(cur)
    levels = list(reversed(chain))
    if factors and factors[-1] == 1:
        levels.append(img)
    return levels


@functools.partial(
    jax.jit, static_argnames=("factors", "tile_size", "use_dog", "mesh"),
)
def _calc_ref_fused(img, factors, tile_size, use_dog, mesh):
    """Reference-side precompute in ONE launch: pyramid + per-level DoG +
    tiled FAST/DAISY features + per-level valid-keypoint counts.

    The host fetches only the (n_lvl,) count vector; pyramid levels and
    feature arrays stay device-resident for ``_register_fused``.
    """
    from microaligner_tpu.features.tile_features import _HALO, _find_features_tiled_jit
    from microaligner_tpu.tiles import TileGrid

    pyr = _build_pyr_levels(img, factors)
    feats = []
    for lvl in pyr:
        det = dog_traced(lvl, use_dog)
        grid = TileGrid.for_image(tuple(lvl.shape), tile_size, _HALO)
        k = min(1_000_000 // grid.num_tiles, 5000)
        feats.append(_find_features_tiled_jit(det, grid, k, mesh))
    n_valid = jnp.stack([jnp.sum(f[2]) for f in feats])
    return tuple(pyr), tuple(feats), n_valid


def _tscale(scale) -> jax.Array:
    """Elementwise mask that rescales a homogeneous matrix's translation."""
    return jnp.asarray(
        [[1.0, 1.0, scale], [1.0, 1.0, scale], [1.0, 1.0, 1.0]], jnp.float32
    )


@functools.partial(
    jax.jit,
    static_argnames=("factors", "tile_size", "num_iterations", "use_dog",
                     "mesh", "dtype_name"),
)
def _register_fused(
    ref_pyr, ref_coords, ref_descs, ref_valids, mov_img,
    factors, tile_size, num_iterations, use_dog, mesh, dtype_name,
):
    """The WHOLE multi-level registration as one device program.

    Mirrors the reference driver loop (feature_registrator.py:75-116): build
    the mov pyramid, and per level (coarse-to-fine) pre-warp the mov level
    with the composed previous full-scale matrices (translations rescaled by
    1/factor), run the fused iterative alignment, rescale the level result
    back to full scale, and chain the homogeneous products.  The host sees
    one launch and fetches one 2x3 matrix + the per-iteration diagnostics —
    on the tunneled dev backend this removes ~15 dispatches and 6 syncs per
    register() call.

    Composition runs in f32 on device (the host path uses f64 numpy); the
    matrices are near-identity with small translations, so the difference is
    below interpolation noise.

    Returns (final 2x3 f32, diags (n_lvl, num_iterations, 5)).
    """
    from microaligner_tpu.features.tile_features import _HALO
    from microaligner_tpu.ops.affine_tiled import affine_warp_traced
    from microaligner_tpu.tiles import TileGrid

    mov_pyr = _build_pyr_levels(mov_img, factors)
    fullscale = []  # homogeneous 3x3, full-resolution scale
    diags = []
    for i, factor in enumerate(factors):
        mov_lvl = mov_pyr[i]
        if i > 0:
            acc = jnp.eye(3, dtype=jnp.float32)
            for m in fullscale:
                acc = acc @ (m * _tscale(1.0 / factor))
            mov_lvl = _cast_like(
                affine_warp_traced(mov_lvl.astype(jnp.float32), acc[:2]), dtype_name
            )
        grid = TileGrid.for_image(tuple(mov_lvl.shape), tile_size, _HALO)
        k = min(1_000_000 // grid.num_tiles, 5000)
        tmat2, _aligned, diag = _level_align_body(
            ref_pyr[i], ref_coords[i], ref_descs[i], ref_valids[i], mov_lvl,
            grid, k, tile_size, num_iterations, use_dog, mesh, dtype_name,
        )
        hom = jnp.concatenate(
            [tmat2, jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)], axis=0
        )
        fullscale.append(hom * _tscale(float(factor)))
        diags.append(diag)
    final = fullscale[0]
    for m in fullscale[1:]:
        final = final @ m
    return final[:2], jnp.stack(diags)


class FeatureRegistrator:
    def __init__(self):
        self._ref_img = np.array([])
        self._mov_img = np.array([])
        self.num_pyr_lvl = 3
        self.num_iterations = 3
        self.tile_size = 1000
        self.use_full_res_img = False
        self.use_dog = True
        self._ref_pyr_features: List[Features] = []
        self._ref_img_pyr: List[np.ndarray] = []
        self._factors = [8, 4, 2]
        self._this_pyr_factor = 1

    @property
    def ref_img(self) -> np.ndarray:
        return self._ref_img

    @ref_img.setter
    def ref_img(self, img: np.ndarray):
        check_img_is_2d_grey(img, "ref")
        self._ref_img = img
        self._ref_pyr_features = []  # invalidate the cache

    @property
    def mov_img(self) -> np.ndarray:
        return self._mov_img  # reference returns _ref_img here (bug); fixed

    @mov_img.setter
    def mov_img(self, img: np.ndarray):
        check_img_is_2d_grey(img, "mov")
        self._mov_img = img

    # -- public API ---------------------------------------------------------

    @staticmethod
    def _fused_register_enabled() -> bool:
        import os

        return (
            os.environ.get("MICROALIGNER_TPU_FUSED_REGISTER", "1") != "0"
            and os.environ.get("MICROALIGNER_TPU_FUSED_LEVEL", "1") != "0"
        )

    def _pyr_factors(self) -> List[int]:
        """Descending pyramid factors for the current image shape (same rules
        as ``_generate_img_pyr``, computed without touching the device)."""
        if self.num_pyr_lvl < 0:
            raise ValueError("Number of pyramid levels cannot be less than 0")
        if self.num_pyr_lvl == 0 and not self.use_full_res_img:
            raise ValueError(
                "Number of pyramid levels is 0 and use_full_res_img is False. "
                "Please change one of the parameters"
            )
        shape = self._ref_img.shape
        n_lvl = 0
        for lvl in range(self.num_pyr_lvl):
            factor = 2 ** (lvl + 1)
            if shape[0] / factor < 100 or shape[1] / factor < 100:
                break
            n_lvl = lvl + 1
        factors = [2 ** (lvl + 1) for lvl in reversed(range(n_lvl))]
        if self.use_full_res_img:
            factors.append(1)
        if not factors:
            raise ValueError(
                f"Image {shape} is too small for any pyramid level (min dim "
                "100 px after downscale) and use_full_res_img is False; "
                "enable use_full_res_img or reduce num_pyr_lvl"
            )
        return factors

    def calc_ref_img_features(self):
        if self._fused_register_enabled():
            from microaligner_tpu.parallel.tile_runner import current_tile_mesh

            self._factors = self._pyr_factors()
            pyr, feats, _n_valid = _calc_ref_fused(
                jnp.asarray(self._ref_img), tuple(self._factors),
                self.tile_size, self.use_dog, current_tile_mesh(),
            )
            self._ref_img_pyr = list(pyr)
            self._ref_pyr_features = [Features(c, d, v, r) for (c, d, v, r) in feats]
            return
        self._ref_img_pyr, self._factors = self._generate_img_pyr(self._ref_img)
        self._ref_pyr_features = [
            find_features(_dog(lvl, self.use_dog), self.tile_size)
            for lvl in self._ref_img_pyr
        ]

    def register(self, reuse_ref_img: bool = False) -> np.ndarray:
        """One mov/ref pair -> 2x3 affine matrix mapping mov coords to ref."""
        check_img_is_provided(self._ref_img, "ref")
        check_img_is_provided(self._mov_img, "mov")
        check_img_dims_match(self._ref_img, self._mov_img)

        if not (reuse_ref_img and self._ref_pyr_features):
            self.calc_ref_img_features()

        if self._fused_register_enabled():
            return self._register_whole()

        mov_img_pyrs, _ = self._generate_img_pyr(self._mov_img)

        fullscale_t_mat_list: List[np.ndarray] = []
        for i, factor in enumerate(self._factors):
            log("Pyramid factor", factor)
            self._this_pyr_factor = factor
            if i == 0:
                mov_lvl = mov_img_pyrs[i]
            else:
                rescaled = [self._rescale_t_mat(m, 1 / factor) for m in fullscale_t_mat_list]
                this_scale_t_mat = self._multiply_transform_matrices(rescaled)
                # device-resident warp: the host transform_img round trip costs
                # a full download+upload of the level per pyramid step
                mov_lvl = self._transform_img_dev(mov_img_pyrs[i], this_scale_t_mat)
            _, t_mat = self._iterative_alignment(
                self._ref_img_pyr[i], self._ref_pyr_features[i], mov_lvl
            )
            fullscale_t_mat_list.append(self._rescale_t_mat(t_mat, factor))
        return self._multiply_transform_matrices(fullscale_t_mat_list)

    def _register_whole(self) -> np.ndarray:
        """Whole-register fused path: one ``_register_fused`` launch, one
        fetch of (matrix, diagnostics); identical math to the per-level driver
        (composition in device f32 instead of host f64)."""
        from microaligner_tpu.parallel.tile_runner import current_tile_mesh

        feats = self._ref_pyr_features
        mov_dev = jnp.asarray(self._mov_img)
        tmat, diags = _register_fused(
            tuple(jnp.asarray(l) for l in self._ref_img_pyr),
            tuple(f.coords for f in feats),
            tuple(f.descriptors for f in feats),
            tuple(f.valid for f in feats),
            mov_dev,
            tuple(self._factors), self.tile_size, self.num_iterations,
            self.use_dog, current_tile_mesh(), mov_dev.dtype.name,
        )
        tmat, diags = jax.device_get((tmat, diags))
        for lvl, factor in enumerate(self._factors):
            log("Pyramid factor", factor)
            for i, (n_good, n_total, after, before, accepted) in enumerate(diags[lvl]):
                log("    Iteration", i + 1, "/", self.num_iterations)
                log("    Good matches", int(n_good), "/", int(n_total))
                log("    MI score after:", float(after), "| MI score before:", float(before))
                log("    Better alignment than before" if accepted > 0
                    else "    Worse alignment than before")
        return np.asarray(tmat, np.float64)

    def transform_img(self, img: np.ndarray, t_mat: np.ndarray) -> np.ndarray:
        """Affine-warp preserving dtype.  One bilinear path for every size —
        the reference's >32k warpAffine/skimage split (feature_registrator.py
        :118-132) is unnecessary with tiled XLA gathers."""
        out = affine_warp(jnp.asarray(img).astype(jnp.float32), t_mat)
        out = np.asarray(jax.device_get(out))
        if np.issubdtype(img.dtype, np.integer):
            info = np.iinfo(img.dtype)
            out = np.clip(np.round(out), info.min, info.max)
        return out.astype(img.dtype)

    def transform_big_img(self, img: np.ndarray, t_mat: np.ndarray) -> np.ndarray:
        """Reference API compat (feature_registrator.py:118-126); same path as
        ``transform_img`` here — no size split needed."""
        return self.transform_img(img, t_mat)

    # -- internals ----------------------------------------------------------

    @staticmethod
    def _dog_np(img: np.ndarray, use_it: bool) -> np.ndarray:
        return np.asarray(jax.device_get(_dog(img, use_it)))

    def _generate_img_pyr(self, arr) -> Tuple[List[jax.Array], List[int]]:
        """Gaussian pyramid, smallest level first (reference
        feature_registrator.py:134-160).

        One fused device program builds every level (``_pyr_chain``) and the
        levels stay device-resident — the per-level launch + host round trip
        of the naive loop costs ~230 ms/level over the tunneled backend.
        """
        if self.num_pyr_lvl < 0:
            raise ValueError("Number of pyramid levels cannot be less than 0")
        if self.num_pyr_lvl == 0 and not self.use_full_res_img:
            raise ValueError(
                "Number of pyramid levels is 0 and use_full_res_img is False. "
                "Please change one of the parameters"
            )
        n_lvl = 0
        for lvl in range(self.num_pyr_lvl):
            factor = 2 ** (lvl + 1)
            if arr.shape[0] / factor < 100 or arr.shape[1] / factor < 100:
                break
            n_lvl = lvl + 1
        factors = [2 ** (lvl + 1) for lvl in range(n_lvl)]
        pyramid = list(_pyr_chain(jnp.asarray(arr), n_lvl)) if n_lvl else []
        factors = list(reversed(factors))
        pyramid = list(reversed(pyramid))
        if self.use_full_res_img:
            pyramid.append(jnp.asarray(arr))
            factors.append(1)
        if not factors:
            raise ValueError(
                f"Image {tuple(arr.shape)} is too small for any pyramid level "
                "(min dim 100 px after downscale) and use_full_res_img is "
                "False; enable use_full_res_img or reduce num_pyr_lvl"
            )
        return pyramid, factors

    def _transform_img_dev(self, img: jax.Array, t_mat: np.ndarray) -> jax.Array:
        """Device-resident ``transform_img``: same dtype-preserving semantics,
        no host round trip."""
        out = affine_warp(jnp.asarray(img).astype(jnp.float32), t_mat)
        return _cast_like(out, jnp.asarray(img).dtype.name)

    def _iterative_alignment(
        self, ref_img, ref_features: Features, mov_img
    ) -> Tuple[np.ndarray, np.ndarray]:
        """One fused device program per level: the whole find -> match -> fit
        -> warp -> MI-gate iteration loop runs in a single launch with the
        accept/reject decision carried on device (``_level_align_fused``);
        the host sees the final 2x3 matrix plus per-iteration diagnostic
        scalars.  ``MICROALIGNER_TPU_FUSED_LEVEL=0`` restores the host-driven
        per-iteration loop (``_iterative_alignment_steps``)."""
        import os

        if self.num_iterations < 1:
            raise ValueError("Number of iterations cannot be less than 1")
        if os.environ.get("MICROALIGNER_TPU_FUSED_LEVEL", "1") == "0":
            return self._iterative_alignment_steps(ref_img, ref_features, mov_img)

        from microaligner_tpu.features.tile_features import _HALO
        from microaligner_tpu.parallel.tile_runner import current_tile_mesh
        from microaligner_tpu.tiles import TileGrid

        if not ref_features.is_valid():
            # no usable reference features: matching yields identity and the
            # gate rejects every iteration (reference behavior).  Log the
            # degenerate cause explicitly — the traced path below masks the
            # same condition silently (n_good >= 3 inside _level_align_body),
            # so this is the one place the observable log can say why.
            log("    No usable reference features (< 3 valid) — identity transform")
            for i in range(self.num_iterations):
                log("    Iteration", i + 1, "/", self.num_iterations)
                log("    Worse alignment than before")
            return jnp.asarray(mov_img), np.eye(2, 3)

        mov_dev = jnp.asarray(mov_img)
        grid = TileGrid.for_image(tuple(mov_dev.shape), self.tile_size, _HALO)
        k = min(1_000_000 // grid.num_tiles, 5000)
        tmat, aligned, diag = _level_align_fused(
            jnp.asarray(ref_img),
            ref_features.coords,
            ref_features.descriptors,
            ref_features.valid,
            mov_dev,
            grid, k, self.tile_size, self.num_iterations, self.use_dog,
            current_tile_mesh(), mov_dev.dtype.name,
        )
        tmat, diag = jax.device_get((tmat, diag))
        for i, (n_good, n_total, after, before, accepted) in enumerate(diag):
            log("    Iteration", i + 1, "/", self.num_iterations)
            log("    Good matches", int(n_good), "/", int(n_total))
            log("    MI score after:", float(after), "| MI score before:", float(before))
            log("    Better alignment than before" if accepted > 0
                else "    Worse alignment than before")
        return aligned, np.asarray(tmat, np.float64)

    def _iterative_alignment_steps(
        self, ref_img, ref_features: Features, mov_img
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Host-driven per-iteration loop (the pre-fusion path; kept for A/B
        timing and as a fallback)."""
        t_matrices: List[np.ndarray] = []
        mov_dev = jnp.asarray(mov_img)
        ref_dev = jnp.asarray(ref_img)
        aligned_img = mov_dev
        for i in range(self.num_iterations):
            log("    Iteration", i + 1, "/", self.num_iterations)
            mov_img_aligned, est_t_mat = self._align_imgs(ref_features, aligned_img)

            mi_after, mi_before = _mi_gate_pair(
                ref_dev, jnp.asarray(mov_img_aligned), aligned_img, self.tile_size
            )
            mi_after, mi_before = jax.device_get((mi_after, mi_before))
            log("    MI score after:", float(mi_after), "| MI score before:", float(mi_before))
            is_more_similar = [float(mi_after) > float(mi_before)]
            is_valid = self._check_if_valid_transform(est_t_mat, mov_dev.shape)

            if any(is_more_similar) and is_valid:
                log("    Better alignment than before")
                t_matrices.append(est_t_mat)
                # realign from the ORIGINAL mov with the composed matrix
                # (feature_registrator.py:186) to avoid resampling build-up
                aligned_img = self._transform_img_dev(
                    mov_dev, self._multiply_transform_matrices(t_matrices)
                )
            else:
                log("    Worse alignment than before")
                t_matrices.append(np.eye(2, 3))
        return aligned_img, self._multiply_transform_matrices(t_matrices)

    def _align_imgs(
        self, ref: Union[np.ndarray, Features], mov_img
    ) -> Tuple[jax.Array, np.ndarray]:
        if not isinstance(ref, Features):
            ref_features = find_features(_dog(ref, self.use_dog), self.tile_size)
        else:
            ref_features = ref
        mov_features = find_features(
            dog_traced(jnp.asarray(mov_img), self.use_dog), self.tile_size
        )
        transform_mat = register_img_pair(ref_features, mov_features)
        if np.array_equal(transform_mat, np.eye(2, 3)):
            return jnp.asarray(mov_img), np.eye(2, 3)
        return self._transform_img_dev(mov_img, transform_mat), transform_mat

    @staticmethod
    def _multiply_transform_matrices(mat_list: List[np.ndarray]) -> np.ndarray:
        if len(mat_list) == 1:
            return mat_list[0]
        hom = [np.vstack([m, [0, 0, 1]]) for m in mat_list]
        res = hom[0]
        for m in hom[1:]:
            res = res @ m
        return res[:2, :]

    @staticmethod
    def _rescale_t_mat(t_mat: np.ndarray, scale: float) -> np.ndarray:
        out = t_mat.copy()
        out[0, 2] *= scale
        out[1, 2] *= scale
        return out

    def _check_if_valid_transform(self, t_mat, img_shape) -> bool:
        return self._check_if_inside_borders(t_mat, img_shape) and self._check_if_proper_scale(t_mat)

    @staticmethod
    def _check_if_proper_scale(t_mat) -> bool:
        """Scale within [0.3, 3] via 2-D transform decomposition
        (feature_registrator.py:240-266)."""
        a, b, c, d = t_mat[0, 0], t_mat[1, 0], t_mat[0, 1], t_mat[1, 1]
        det = a * d - b * c
        if a != 0 or b != 0:
            r = np.sqrt(a * a + b * b)
            scale = (r, det / r)
        elif c != 0 or d != 0:
            s = np.sqrt(c * c + d * d)
            scale = (det / s, s)
        else:
            return False
        return 0.3 <= abs(scale[0]) <= 3 and 0.3 <= abs(scale[1]) <= 3

    @staticmethod
    def _check_if_inside_borders(t_mat, img_shape) -> bool:
        """Transformed image center stays inside the image
        (feature_registrator.py:268-278)."""
        cy, cx = img_shape[0] // 2, img_shape[1] // 2
        hom = np.vstack([t_mat, [0, 0, 1]])
        center = hom @ np.array([cx, cy, 1.0])
        border = np.array([img_shape[1], img_shape[0], 1.0])
        return not np.any(border - np.abs(center) < 0)
