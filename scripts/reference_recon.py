"""Faithful cv2/numpy/sklearn reconstruction of the reference OptFlow pipeline.

The reference package itself cannot run in this environment (its deps dask,
pint, tifffile and scikit-image are not installed, and installs are not
allowed), so E2E comparisons run against this reconstruction instead: the
same OpenCV kernels the reference calls (cv.calcOpticalFlowFarneback,
cv.remap, cv.pyrDown/pyrUp, cv.GaussianBlur, cv.normalize), the same sklearn
NMI gate, and the reference's exact control flow, transcribed line-by-line
from /root/reference/microaligner/optflow_reg/optflow_registrator.py:93-173,
flow_calc.py:30-98, warper.py:37-76, shared_modules/slicer.py,
stitcher.py and similarity_scoring.py (dask pool replaced by a serial loop —
identical results, tiles are independent).

``faithful_bugs`` controls two reference defects (both documented in
PARITY.md):

* merge_two_flows (optflow_registrator.py:37-47) passes ``-flow1`` to
  cv.remap as an *absolute* coordinate map — the meshgrid its own Warper adds
  (warper.py:55-60) is missing, so composition samples flow2 near the origin
  for every pixel.  The intended (and our) composition samples at
  ``meshgrid - flow1``.
* a rejected mid-pyramid level upscales with ``pyrUp(m_flow*4)``
  (optflow_registrator.py:169) where every other path uses ``*2``.
"""

from __future__ import annotations

import math

import cv2 as cv
import numpy as np
from sklearn.metrics import normalized_mutual_info_score


# ---- shared_modules/slicer.py + stitcher.py ------------------------------


def split_tiles(img, tile_size, overlap):
    """Reference split_image_into_tiles_of_size: ceil-div grid, each tile the
    (tile, tile) interior expanded by ``overlap`` on all sides, zero padding
    outside the image."""
    h, w = img.shape[:2]
    ny = -(-h // tile_size)
    nx = -(-w // tile_size)
    pad_h = ny * tile_size - h
    pad_w = nx * tile_size - w
    if img.ndim == 2:
        canvas = np.pad(img, ((overlap, pad_h + overlap), (overlap, pad_w + overlap)))
    else:
        canvas = np.pad(
            img, ((overlap, pad_h + overlap), (overlap, pad_w + overlap), (0, 0))
        )
    t = tile_size + 2 * overlap
    tiles = [
        canvas[i * tile_size : i * tile_size + t, j * tile_size : j * tile_size + t]
        for i in range(ny)
        for j in range(nx)
    ]
    info = {"ny": ny, "nx": nx, "tile_size": tile_size, "overlap": overlap, "h": h, "w": w}
    return tiles, info


def stitch_tiles(tiles, info):
    ts, o = info["tile_size"], info["overlap"]
    ny, nx, h, w = info["ny"], info["nx"], info["h"], info["w"]
    extra = tiles[0].shape[2:] if tiles[0].ndim == 3 else ()
    out = np.zeros((ny * ts, nx * ts) + extra, tiles[0].dtype)
    for i in range(ny):
        for j in range(nx):
            out[i * ts : (i + 1) * ts, j * ts : (j + 1) * ts] = tiles[i * nx + j][
                o : o + ts, o : o + ts
            ]
    return out[:h, :w]


# ---- optflow_reg/flow_calc.py ---------------------------------------------


def farneback(mov_img, ref_img, win_size, num_iter):
    return cv.calcOpticalFlowFarneback(
        mov_img, ref_img, None,
        pyr_scale=0.5, levels=0, winsize=win_size, iterations=num_iter,
        poly_n=1, poly_sigma=1.7, flags=cv.OPTFLOW_FARNEBACK_GAUSSIAN,
    )


def calc_flow(ref_img, mov_img, tile_size, overlap, win_size, num_iter):
    if max(ref_img.shape) / tile_size < 2:
        return farneback(mov_img, ref_img, win_size, num_iter)
    ref_tiles, info = split_tiles(ref_img, tile_size, overlap)
    mov_tiles, _ = split_tiles(mov_img, tile_size, overlap)
    flow_tiles = [
        farneback(m, r, win_size, num_iter) for m, r in zip(mov_tiles, ref_tiles)
    ]
    return stitch_tiles(flow_tiles, info)


# ---- optflow_reg/warper.py -------------------------------------------------


def warp_with_flow(img, flow):
    h, w = flow.shape[:2]
    new_flow = np.negative(flow)
    new_flow[:, :, 0] += np.arange(w)
    new_flow[:, :, 1] += np.arange(h).reshape(-1, 1)
    return cv.remap(img, new_flow, None, cv.INTER_LINEAR)


def warp_tiled(image, flow, tile_size, overlap):
    img_tiles, info = split_tiles(image, tile_size, overlap)
    flow_tiles, _ = split_tiles(flow, tile_size, overlap)
    warped = [warp_with_flow(i, f) for i, f in zip(img_tiles, flow_tiles)]
    return stitch_tiles(warped, info)


# ---- similarity_scoring.py --------------------------------------------------


def mi_tiled(arr1, arr2, tile_size):
    if max(arr1.shape) / tile_size < 2:
        return normalized_mutual_info_score(arr1.flatten(), arr2.flatten())
    indices = list(range(0, arr1.size, tile_size * tile_size))
    a1 = np.array_split(arr1.flatten(), indices)
    a2 = np.array_split(arr2.flatten(), indices)
    scores = [
        normalized_mutual_info_score(x, y) for x, y in zip(a1, a2) if x.size != 0
    ]
    return float(np.mean(scores))


def check_if_higher_similarity(ref_arr, test_arr, init_arr, tile_size):
    after = mi_tiled(ref_arr, test_arr, tile_size)
    before = mi_tiled(ref_arr, init_arr, tile_size)
    return [after > before]


# ---- optflow_registrator.py -------------------------------------------------


def dog(img, use_it, low_sigma=5, high_sigma=9):
    if not use_it or img.max() == 0:
        return img
    fimg = cv.normalize(img, None, 0, 1, cv.NORM_MINMAX, cv.CV_32F)
    kernel = (low_sigma * 4 * 2 + 1, low_sigma * 4 * 2 + 1)
    ls = cv.GaussianBlur(fimg, kernel, sigmaX=low_sigma, sigmaY=low_sigma)
    hs = cv.GaussianBlur(fimg, kernel, sigmaX=high_sigma, sigmaY=high_sigma)
    return cv.normalize(hs - ls, None, 0, 255, cv.NORM_MINMAX, cv.CV_8U)


def merge_two_flows(flow1, flow2, faithful_bugs=False):
    if flow1.max() == 0:
        return flow2
    if flow2.max() == 0:
        return flow1
    if faithful_bugs:
        # verbatim reference: -flow1 used as an ABSOLUTE map (missing meshgrid)
        sampled = cv.remap(flow2, -flow1, None, cv.INTER_LINEAR)
    else:
        h, w = flow1.shape[:2]
        m = np.negative(flow1)
        m[:, :, 0] += np.arange(w)
        m[:, :, 1] += np.arange(h).reshape(-1, 1)
        sampled = cv.remap(flow2, m, None, cv.INTER_LINEAR)
    return flow1 + sampled


def merge_flows_tiled(flow1, flow2, tile_size, overlap, faithful_bugs=False):
    f1, info = split_tiles(flow1, tile_size, overlap)
    f2, _ = split_tiles(flow2, tile_size, overlap)
    merged = [merge_two_flows(a, b, faithful_bugs) for a, b in zip(f1, f2)]
    return stitch_tiles(merged, info)


class OptFlowRegistratorRecon:
    """Reference OptFlowRegistrator, transcribed (optflow_registrator.py:51-247)."""

    def __init__(self, faithful_bugs=False):
        self.ref_img = np.array([])
        self.mov_img = np.array([])
        self.num_pyr_lvl = 4
        self.num_iterations = 3
        self.tile_size = 1000
        self.overlap = 100
        self.use_full_res_img = False
        self.use_dog = False
        self.faithful_bugs = faithful_bugs

    def _generate_img_pyr(self, arr):
        pyramid, factors = [], []
        pyr_lvl = arr.copy()
        for lvl in range(self.num_pyr_lvl):
            factor = 2 ** (lvl + 1)
            if arr.shape[0] / factor < 100 or arr.shape[1] / factor < 100:
                break
            pyr_lvl = cv.pyrDown(pyr_lvl)
            pyramid.append(pyr_lvl)
            factors.append(factor)
        factors = list(reversed(factors))
        pyramid = list(reversed(pyramid))
        if self.use_full_res_img:
            pyramid.append(arr)
            factors.append(1)
        return pyramid, factors

    def _upscale_flow_to_full_res(self, flow, pyramid_factor):
        if abs(flow.shape[0] - self.ref_img.shape[0]) <= 1:
            return flow
        num_lvls = int(math.log2(pyramid_factor))
        upscaled = flow
        for i in range(num_lvls):
            if i == num_lvls - 1:
                upscaled = cv.pyrUp(flow, dstsize=self.ref_img.shape[::-1])
            else:
                upscaled = cv.pyrUp(upscaled)
        return upscaled

    def register(self):
        win_size = self.overlap - (1 - self.overlap % 2)
        ref_pyr, factors = self._generate_img_pyr(self.ref_img)
        mov_pyr, _ = self._generate_img_pyr(self.mov_img)
        num_lvl = len(factors)
        m_flow = None
        for lvl, factor in enumerate(factors):
            mov_this_lvl = mov_pyr[lvl].copy()
            if lvl != 0:
                mov_this_lvl = warp_tiled(
                    mov_this_lvl, m_flow, self.tile_size, self.overlap
                )
            this_flow = calc_flow(
                dog(ref_pyr[lvl], self.use_dog),
                dog(mov_this_lvl, self.use_dog),
                self.tile_size, self.overlap, win_size, self.num_iterations,
            )
            mov_warped = warp_tiled(mov_this_lvl, this_flow, self.tile_size, self.overlap)
            higher = check_if_higher_similarity(
                dog(ref_pyr[lvl], True),
                dog(mov_warped, True),
                dog(mov_pyr[lvl], True),
                self.tile_size,
            )
            if any(higher):
                if lvl == 0:
                    if num_lvl > 1:
                        m_flow = cv.pyrUp(this_flow * 2, dstsize=mov_pyr[lvl + 1].shape[::-1])
                    else:
                        m_flow = self._upscale_flow_to_full_res(this_flow, factor)
                elif lvl == num_lvl - 1:
                    m_flow = merge_flows_tiled(
                        m_flow, this_flow, self.tile_size, self.overlap, self.faithful_bugs
                    )
                    if not self.use_full_res_img:
                        m_flow = self._upscale_flow_to_full_res(m_flow, factor)
                else:
                    m_flow = merge_flows_tiled(
                        m_flow, this_flow, self.tile_size, self.overlap, self.faithful_bugs
                    )
                    m_flow = cv.pyrUp(m_flow * 2, dstsize=mov_pyr[lvl + 1].shape[::-1])
            else:
                if lvl == 0:
                    shape = list(mov_pyr[lvl + 1].shape) if num_lvl > 1 else list(self.mov_img.shape)
                    m_flow = np.zeros(shape + [2], np.float32)
                elif lvl == num_lvl - 1:
                    if not self.use_full_res_img:
                        m_flow = cv.pyrUp(m_flow * 2, dstsize=self.mov_img.shape[::-1])
                else:
                    mult = 4 if self.faithful_bugs else 2
                    m_flow = cv.pyrUp(m_flow * mult, dstsize=mov_pyr[lvl + 1].shape[::-1])
        return m_flow


# ---- feature_reg/ -----------------------------------------------------------
#
# Reconstruction of the reference FeatureRegistrator for the CPU baseline:
# the same kernel calls it makes (cv.FastFeatureDetector, FLANN knnMatch,
# cv.estimateAffinePartial2D RANSAC, cv.warpAffine, sklearn NMI) with its
# exact control flow (feature_registrator.py:75-278, feature_detection.py:
# 88-158, tile_registration.py:29-97).  The one substitution: cv2-contrib's
# DAISY is absent from this build, so descriptors come from daisy_cv below —
# the same orientation-histogram math executed with cv.GaussianBlur (C-speed
# separable convolution, the dominant cost in contrib's implementation too)
# plus a vectorized numpy bilinear gather.  It is the honest stand-in the
# round-3 review asked for: config-1 baselines now PAY for dense descriptor
# computation instead of skipping it.

_DAISY_R, _DAISY_QR, _DAISY_QT, _DAISY_QH = 21.0, 3, 8, 8


def daisy_cv(img, coords):
    """DAISY descriptors at (K, 2) [x, y] coords; cv2-blur backed."""
    f = cv.GaussianBlur(img.astype(np.float32), (3, 3), 0.5)
    gx = cv.Sobel(f, cv.CV_32F, 1, 0, ksize=1) * 0.5
    gy = cv.Sobel(f, cv.CV_32F, 0, 1, ksize=1) * 0.5
    layers = []
    for o in range(_DAISY_QH):
        t = 2.0 * np.pi * o / _DAISY_QH
        layers.append(np.maximum(np.cos(t) * gx + np.sin(t) * gy, 0.0))
    sigmas = [_DAISY_R * (i + 1) / (2 * _DAISY_QR) for i in range(_DAISY_QR)]
    cubes, prev, cur = [], 0.0, layers
    for s in sigmas:
        inc = math.sqrt(s * s - prev * prev)
        k = int(round(inc * 4)) * 2 + 1
        cur = [cv.GaussianBlur(l, (k, k), inc) for l in cur]
        cubes.append(np.stack(cur, axis=-1))  # (H, W, 8)
        prev = s
    grid = [(0.0, 0.0, 0)]
    for ring in range(_DAISY_QR):
        r = _DAISY_R * (ring + 1) / _DAISY_QR
        for kk in range(_DAISY_QT):
            a = 2.0 * np.pi * kk / _DAISY_QT
            grid.append((r * np.cos(a), r * np.sin(a), ring))
    h, w = img.shape
    coords = np.asarray(coords, np.float32).reshape(-1, 2)
    parts = []
    for dx, dy, ring in grid:
        x = np.clip(coords[:, 0] + dx, 0, w - 1.001)
        y = np.clip(coords[:, 1] + dy, 0, h - 1.001)
        x0, y0 = x.astype(np.int32), y.astype(np.int32)
        x1, y1 = np.minimum(x0 + 1, w - 1), np.minimum(y0 + 1, h - 1)
        tx, ty = (x - x0)[:, None], (y - y0)[:, None]
        c = cubes[ring]
        parts.append(
            c[y0, x0] * (1 - tx) * (1 - ty) + c[y0, x1] * tx * (1 - ty)
            + c[y1, x0] * (1 - tx) * ty + c[y1, x1] * tx * ty
        )
    return np.concatenate(parts, axis=-1).astype(np.float32)  # (K, 200)


def find_features_recon(img, tile_size):
    """tile_registration.py:29-97 + feature_detection.py:88-118: FAST on each
    tile interior, top-k by response, DAISY on the halo tile at interior
    coords, keypoints shifted to global coords, descriptors concatenated."""
    overlap = 51
    tiles, info = split_tiles(img, tile_size, overlap)
    n_tiles = len(tiles)
    limit = min(1_000_000 // n_tiles, 5000)
    det = cv.FastFeatureDetector_create(
        threshold=1, nonmaxSuppression=True, type=cv.FAST_FEATURE_DETECTOR_TYPE_9_16
    )
    all_pts, all_desc = [], []
    for t_id, tile in enumerate(tiles):
        interior = tile[overlap:-overlap, overlap:-overlap]
        kps = det.detect(interior, None)
        kps = sorted(kps, key=lambda kp: kp.response, reverse=True)[:limit]
        if not kps:
            continue
        pts = np.asarray([kp.pt for kp in kps], np.float32)
        desc = daisy_cv(tile, pts)  # halo tile at interior coords (the quirk)
        oy = t_id // info["nx"] * tile_size
        ox = t_id % info["nx"] * tile_size
        all_pts.append(pts + [ox, oy])
        all_desc.append(desc)
    if not all_pts:
        return np.zeros((0, 2), np.float32), np.zeros((0, 200), np.float32)
    return np.concatenate(all_pts), np.concatenate(all_desc)


def match_features_recon(ref_pts, ref_desc, mov_pts, mov_desc):
    """feature_detection.py:121-158: FLANN knn(k=2) + 0.5 ratio + RANSAC."""
    if len(ref_pts) < 3 or len(mov_pts) < 3:
        return np.eye(2, 3)
    matcher = cv.FlannBasedMatcher()
    matches = matcher.knnMatch(mov_desc, ref_desc, k=2)
    src, dst = [], []
    for pair in matches:
        if len(pair) == 2 and pair[0].distance < 0.5 * pair[1].distance:
            src.append(mov_pts[pair[0].queryIdx])
            dst.append(ref_pts[pair[0].trainIdx])
    if len(src) < 3:
        return np.eye(2, 3)
    tmat, _ = cv.estimateAffinePartial2D(
        np.asarray(src).reshape(-1, 1, 2), np.asarray(dst).reshape(-1, 1, 2),
        method=cv.RANSAC, confidence=0.99,
    )
    return np.eye(2, 3) if tmat is None else tmat


class FeatureRegistratorRecon:
    """Reference FeatureRegistrator, transcribed (feature_registrator.py)."""

    def __init__(self):
        self.ref_img = None
        self.mov_img = None
        self.num_pyr_lvl = 3
        self.num_iterations = 3
        self.tile_size = 1000
        self.use_full_res_img = False
        self.use_dog = True
        self._ref_pyr = None
        self._ref_feats = None
        self._factors = None

    def _pyr(self, arr):
        factors, levels = [], []
        cur = arr
        chain = []
        for lvl in range(self.num_pyr_lvl):
            factor = 2 ** (lvl + 1)
            if arr.shape[0] / factor < 100 or arr.shape[1] / factor < 100:
                break
            cur = cv.pyrDown(cur)
            chain.append(cur)
            factors.append(factor)
        levels = list(reversed(chain))
        factors = list(reversed(factors))
        if self.use_full_res_img:
            levels.append(arr)
            factors.append(1)
        return levels, factors

    @staticmethod
    def _compose(mats):
        res = np.vstack([mats[0], [0, 0, 1]])
        for m in mats[1:]:
            res = res @ np.vstack([m, [0, 0, 1]])
        return res[:2]

    @staticmethod
    def _rescale(t_mat, scale):
        out = t_mat.copy()
        out[0, 2] *= scale
        out[1, 2] *= scale
        return out

    @staticmethod
    def _valid(t_mat, shape):
        a, b, c, d = t_mat[0, 0], t_mat[1, 0], t_mat[0, 1], t_mat[1, 1]
        det = a * d - b * c
        if a != 0 or b != 0:
            r = math.sqrt(a * a + b * b)
            scale = (r, det / r)
        elif c != 0 or d != 0:
            s = math.sqrt(c * c + d * d)
            scale = (det / s, s)
        else:
            return False
        if not (0.3 <= abs(scale[0]) <= 3 and 0.3 <= abs(scale[1]) <= 3):
            return False
        cy, cx = shape[0] // 2, shape[1] // 2
        hom = np.vstack([t_mat, [0, 0, 1]])
        center = hom @ np.array([cx, cy, 1.0])
        border = np.array([shape[1], shape[0], 1.0])
        return not np.any(border - np.abs(center) < 0)

    def register(self):
        self._ref_pyr, self._factors = self._pyr(self.ref_img)
        self._ref_feats = [
            find_features_recon(dog(lvl, self.use_dog), self.tile_size)
            for lvl in self._ref_pyr
        ]
        mov_pyr, _ = self._pyr(self.mov_img)
        fullscale = []
        for i, factor in enumerate(self._factors):
            mov_lvl = mov_pyr[i]
            if i > 0:
                rescaled = [self._rescale(m, 1 / factor) for m in fullscale]
                mov_lvl = cv.warpAffine(
                    mov_lvl, self._compose(rescaled), mov_lvl.shape[::-1]
                )
            ref_lvl = self._ref_pyr[i]
            ref_pts, ref_desc = self._ref_feats[i]
            mats = []
            aligned = mov_lvl
            for _ in range(self.num_iterations):
                mov_pts, mov_desc = find_features_recon(
                    dog(aligned, self.use_dog), self.tile_size
                )
                est = match_features_recon(ref_pts, ref_desc, mov_pts, mov_desc)
                cand = cv.warpAffine(aligned, est, aligned.shape[::-1])
                ok = check_if_higher_similarity(
                    dog(ref_lvl, True), dog(cand, True), dog(aligned, True),
                    self.tile_size,
                )
                if any(ok) and self._valid(est, mov_lvl.shape):
                    mats.append(est)
                    aligned = cv.warpAffine(
                        mov_lvl if i > 0 else mov_pyr[i], self._compose(mats),
                        aligned.shape[::-1],
                    )
                else:
                    mats.append(np.eye(2, 3))
            fullscale.append(self._rescale(self._compose(mats), factor))
        return self._compose(fullscale)
