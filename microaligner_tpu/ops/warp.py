"""Bilinear resampling: remap, affine warp, flow application & composition.

TPU-native equivalents of ``cv.remap(INTER_LINEAR)`` / ``cv.warpAffine`` /
``skimage.transform.warp`` (reference call sites: optflow_reg/warper.py:62-67,
optflow_registrator.py:45, feature_registrator.py:118-132,
shared_modules/utils.py:98-114).

All sampling is float bilinear with BORDER_CONSTANT(0): taps that fall outside
the source contribute zero, matching OpenCV's default border for remap and
warpAffine.  OpenCV quantizes coordinates to 1/32 px internally; we keep full
float precision (strictly more accurate), so comparisons against OpenCV
goldens are tolerance-based.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from microaligner_tpu.ops.pad import pad_to_shape

__all__ = [
    "bilinear_remap",
    "warp_with_flow",
    "warp_planes_with_flow",
    "affine_warp",
    "compose_flows",
    "transform_img_with_tmat",
]


def bilinear_remap(img: jax.Array, map_x: jax.Array, map_y: jax.Array) -> jax.Array:
    """Sample ``img`` at float coordinates (map_y, map_x), zero outside.

    ``img`` is (H, W) or (H, W, C); maps are (Ho, Wo).  Output is
    (Ho, Wo[, C]) in float32.  Out-of-range *taps* read 0 (so a sample
    straddling the border blends with zeros, like cv.remap BORDER_CONSTANT).
    """
    orig_dtype = img.dtype
    squeeze = img.ndim == 2
    x = img.astype(jnp.float32)
    if squeeze:
        x = x[..., None]
    h, w, _ = x.shape

    x0 = jnp.floor(map_x)
    y0 = jnp.floor(map_y)
    fx = (map_x - x0)[..., None]
    fy = (map_y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        v = x[yc, xc]  # gather: (Ho, Wo, C)
        return jnp.where(valid[..., None], v, 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    if squeeze:
        out = out[..., 0]
    if jnp.issubdtype(orig_dtype, jnp.integer):
        info = jnp.iinfo(orig_dtype)
        out = jnp.clip(jnp.round(out), info.min, info.max).astype(orig_dtype)
    return out


def _displacement_fields(flow: jax.Array):
    """Integer/fractional parts of per-pixel displacement (relative)."""
    fx = flow[..., 0]
    fy = flow[..., 1]
    x1 = jnp.floor(fx)
    y1 = jnp.floor(fy)
    tx = fx - x1
    ty = fy - y1
    return x1.astype(jnp.int32), y1.astype(jnp.int32), tx, ty


def _sample_banded_one(img: jax.Array, flow: jax.Array, band: int) -> jax.Array:
    """out(p) = bilinear img(p + flow(p)) with zero outside, via shifted views.

    Exact for integer displacements in [-band, band-1]; out-of-band pixels
    return 0 (callers guard with a runtime fallback).  Gather-free: TPU's
    arbitrary gather is ~50x slower than these fused shift/select/FMA passes.
    ``img`` is (H, W, C).
    """
    h, w = flow.shape[:2]
    c = img.shape[-1]
    dxi, dyi, tx, ty = _displacement_fields(flow)
    p = jnp.pad(img, ((band + 1, band + 1), (band + 1, band + 1), (0, 0)))

    # scan over the row offset d (keeps the compiled graph small); the column
    # offsets e are unrolled inside so XLA fuses them into one VPU loop
    def row_term(out, d):
        wy = jnp.where(dyi == d, 1 - ty, jnp.where(dyi == d - 1, ty, 0.0))
        rows = jax.lax.dynamic_slice(p, (band + 1 + d, 0, 0), (h, p.shape[1], c))
        cd = jnp.zeros((h, w, c), img.dtype)
        for e in range(-band, band + 1):
            wx = jnp.where(dxi == e, 1 - tx, jnp.where(dxi == e - 1, tx, 0.0))
            shifted = jax.lax.dynamic_slice(rows, (0, band + 1 + e, 0), (h, w, c))
            cd = cd + wx[..., None] * shifted
        return out + wy[..., None] * cd, None

    ds = jnp.arange(-band, band + 1)
    out, _ = jax.lax.scan(row_term, jnp.zeros((h, w, c), img.dtype), ds)
    return out


def _sample_take_one(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Exact gather fallback with the same zero-outside semantics."""
    h, w = flow.shape[:2]
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    return bilinear_remap(img, gx + flow[..., 0], gy + flow[..., 1])


# Band for the Mosaic sampling kernel: its offset loops have DYNAMIC bounds
# and skip absent offsets at runtime, so a wide band costs nothing on typical
# sub-pixel flows while keeping rare few-pixel excursions (final composed
# flows reach +-5 px at borders) off the whole-batch exact-gather fallback.
# 7 is the widest geometry validated on v5e (see ops/pallas_matrices.py).
_PALLAS_SAMPLE_BAND = 7


def sample_displaced_batched(imgs: jax.Array, flows: jax.Array, band: int = 4) -> jax.Array:
    """Batched ``out(p) = bilinear imgs(p + flow(p))``, zero outside.

    ``imgs`` is (N, H, W, C); ``flows`` is (N, H, W, 2).  Uses the banded
    gather-free path when every displacement that touches the image fits in
    the static band (the Mosaic kernel's wider band when available), else
    falls back to the exact gather — decided by ONE lax.cond outside any
    vmap, so results always match cv.remap semantics.
    """
    h, w = flows.shape[1:3]

    use_pallas = (
        imgs.shape[-1] == 1
        # the kernel's row block must hold the band's roll range AND stay a
        # multiple of 8 sublanes: h in [2*band+1, 15] would yield a 15-row
        # block, violating the documented alignment (ADVICE round 2)
        and h >= 16
        and jax.default_backend() in ("tpu", "axon")
    )
    if use_pallas:
        # compile-and-compare guard: a Mosaic miscompile on an untested TPU
        # generation must fall back to the XLA path, not corrupt results
        from microaligner_tpu.ops.pallas_sample import pallas_available

        use_pallas = pallas_available()
    band_eff = _PALLAS_SAMPLE_BAND if use_pallas else band

    dxi, dyi, _, _ = jax.vmap(_displacement_fields)(flows)
    gx = jax.lax.broadcasted_iota(jnp.int32, dxi.shape, 2)
    gy = jax.lax.broadcasted_iota(jnp.int32, dyi.shape, 1)
    in_band = (
        (dxi >= -band_eff) & (dxi <= band_eff - 1)
        & (dyi >= -band_eff) & (dyi <= band_eff - 1)
    )
    # pixels whose whole 2x2 stencil is outside the image contribute 0 in
    # both paths, so they don't need band coverage
    abs_x = gx + dxi
    abs_y = gy + dyi
    fully_outside = (abs_x < -1) | (abs_x > w - 1) | (abs_y < -1) | (abs_y > h - 1)
    ok = jnp.all(in_band | fully_outside)

    def banded(args):
        im, fl = args
        if use_pallas:
            from microaligner_tpu.ops.pallas_sample import pallas_sample_displaced

            return pallas_sample_displaced(
                im[..., 0], fl[..., 0], fl[..., 1], band=band_eff
            )[..., None]
        return jax.vmap(lambda i, f: _sample_banded_one(i, f, band))(im, fl)

    return jax.lax.cond(
        ok,
        banded,
        lambda args: jax.vmap(_sample_take_one)(*args),
        (imgs, flows),
    )


def warp_with_flow_batched(imgs: jax.Array, flows: jax.Array, band: int = 4) -> jax.Array:
    """Batched Warper kernel: out(p) = imgs(p - flow(p)) (reference
    optflow_reg/warper.py:55-67 semantics), gather-free when in band."""
    squeeze = imgs.ndim == 3
    x = imgs.astype(jnp.float32)
    if squeeze:
        x = x[..., None]
    out = sample_displaced_batched(x, -flows, band)
    return out[..., 0] if squeeze else out


def warp_with_flow_parts_batched(
    imgs: jax.Array, fx: jax.Array, fy: jax.Array, band: int = 4
) -> jax.Array:
    """``warp_with_flow_batched`` with separate flow channels — keeps the
    trailing-2 stacked layout out of the hot path (see _farneback_core_parts);
    the stack only materializes on the rare exact-gather fallback."""
    h, w = fx.shape[1:3]
    x = imgs.astype(jnp.float32)
    use_pallas = (
        h >= 16 and jax.default_backend() in ("tpu", "axon")
    )
    if use_pallas:
        from microaligner_tpu.ops.pallas_sample import pallas_available

        use_pallas = pallas_available()
    if not use_pallas:
        return warp_with_flow_batched(x, jnp.stack([fx, fy], axis=-1), band)

    band_eff = _PALLAS_SAMPLE_BAND
    nfx, nfy = -fx, -fy
    dxi = jnp.floor(nfx).astype(jnp.int32)
    dyi = jnp.floor(nfy).astype(jnp.int32)
    gx = jax.lax.broadcasted_iota(jnp.int32, dxi.shape, 2)
    gy = jax.lax.broadcasted_iota(jnp.int32, dyi.shape, 1)
    in_band = (
        (dxi >= -band_eff) & (dxi <= band_eff - 1)
        & (dyi >= -band_eff) & (dyi <= band_eff - 1)
    )
    abs_x = gx + dxi
    abs_y = gy + dyi
    fully_outside = (abs_x < -1) | (abs_x > w - 1) | (abs_y < -1) | (abs_y > h - 1)
    ok = jnp.all(in_band | fully_outside)

    def banded(args):
        im, px, py = args
        from microaligner_tpu.ops.pallas_sample import pallas_sample_displaced

        return pallas_sample_displaced(im, px, py, band=band_eff)

    def exact(args):
        im, px, py = args
        return jax.vmap(_sample_take_one)(
            im[..., None], jnp.stack([px, py], axis=-1)
        )[..., 0]

    return jax.lax.cond(ok, banded, exact, (x, nfx, nfy))


def warp_planes_with_flow(imgs: jax.Array, flow: jax.Array, band: int = 4) -> jax.Array:
    """Warp N planes by ONE shared flow: out[n](p) = imgs[n](p - flow(p)).

    The z-stack / multi-channel apply shape (reference __main__.py:288-302:
    every channel and z plane of a cycle warped by the cycle's single flow).
    The per-offset bilinear weight fields depend only on the flow, so they are
    computed once and broadcast over the plane axis — N independent
    ``warp_with_flow_batched`` calls each recompute them.

    ``imgs`` (N, H, W); ``flow`` (H, W, 2).  Returns (N, H, W) f32.
    """
    h, w = flow.shape[:2]
    x = imgs.astype(jnp.float32)
    nfx = -flow[..., 0]
    nfy = -flow[..., 1]

    use_pallas = h >= 16 and jax.default_backend() in ("tpu", "axon")
    if use_pallas:
        from microaligner_tpu.ops.pallas_sample import pallas_multi_available

        use_pallas = pallas_multi_available()
    band_eff = _PALLAS_SAMPLE_BAND if use_pallas else band

    dxi = jnp.floor(nfx).astype(jnp.int32)
    dyi = jnp.floor(nfy).astype(jnp.int32)
    gx = jax.lax.broadcasted_iota(jnp.int32, dxi.shape, 1)
    gy = jax.lax.broadcasted_iota(jnp.int32, dyi.shape, 0)
    in_band = (
        (dxi >= -band_eff) & (dxi <= band_eff - 1)
        & (dyi >= -band_eff) & (dyi <= band_eff - 1)
    )
    abs_x = gx + dxi
    abs_y = gy + dyi
    fully_outside = (abs_x < -1) | (abs_x > w - 1) | (abs_y < -1) | (abs_y > h - 1)
    ok = jnp.all(in_band | fully_outside)

    def banded(args):
        im, px, py = args
        if use_pallas:
            from microaligner_tpu.ops.pallas_sample import pallas_sample_displaced_multi

            return pallas_sample_displaced_multi(im, px, py, band=band_eff)
        # channels-last form of the same shared-weight accumulation
        out = _sample_banded_one(
            jnp.moveaxis(im, 0, -1), jnp.stack([px, py], axis=-1), band
        )
        return jnp.moveaxis(out, -1, 0)

    def exact(args):
        im, px, py = args
        out = _sample_take_one(
            jnp.moveaxis(im, 0, -1), jnp.stack([px, py], axis=-1)
        )
        return jnp.moveaxis(out, -1, 0)

    return jax.lax.cond(ok, banded, exact, (x, nfx, nfy))


@jax.jit
def warp_with_flow(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Warp ``img`` by a flow field: out(p) = img(p - flow(p)).

    Matches the reference Warper semantics (optflow_reg/warper.py:55-67):
    the remap coordinates are ``-flow + meshgrid``.
    ``flow`` is (H, W, 2) with channel 0 = x displacement, 1 = y displacement.
    """
    h, w = flow.shape[:2]
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    return bilinear_remap(img, gx - flow[..., 0], gy - flow[..., 1])


@jax.jit
def _remap_by_flow(arr: jax.Array, flow_map: jax.Array) -> jax.Array:
    """cv.remap(arr, map=flow_map) where flow_map's channels are absolute x/y."""
    return bilinear_remap(arr, flow_map[..., 0], flow_map[..., 1])


@jax.jit
def compose_flows(flow1: jax.Array, flow2: jax.Array) -> jax.Array:
    """Compose two flow fields: ``flow1 + remap(flow2, -flow1 + grid)``.

    Mirrors ``merge_two_flows`` (optflow_registrator.py:37-47) including its
    short-circuits when either flow is all non-positive (the reference tests
    ``flow.max() == 0``).
    """
    h, w = flow1.shape[:2]
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    sampled = bilinear_remap(flow2, gx - flow1[..., 0], gy - flow1[..., 1])
    merged = flow1 + sampled
    f1_zero = jnp.max(flow1) == 0
    f2_zero = jnp.max(flow2) == 0
    return jnp.where(f1_zero, flow2, jnp.where(f2_zero, flow1, merged))


@functools.partial(jax.jit, static_argnames=("band",))
def compose_flows_batched(flow1: jax.Array, flow2: jax.Array, band: int = 4) -> jax.Array:
    """Batched flow composition on the gather-free sampling path."""
    sampled = sample_displaced_batched(flow2, -flow1, band)
    merged = flow1 + sampled
    f1_zero = (jnp.max(flow1, axis=(1, 2, 3)) == 0)[:, None, None, None]
    f2_zero = (jnp.max(flow2, axis=(1, 2, 3)) == 0)[:, None, None, None]
    return jnp.where(f1_zero, flow2, jnp.where(f2_zero, flow1, merged))


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def _affine_warp_core(img: jax.Array, inv_mat: jax.Array, out_h: int, out_w: int) -> jax.Array:
    gx = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    src_x = inv_mat[0, 0] * gx + inv_mat[0, 1] * gy + inv_mat[0, 2]
    src_y = inv_mat[1, 0] * gx + inv_mat[1, 1] * gy + inv_mat[1, 2]
    return bilinear_remap(img, src_x, src_y)


def affine_warp(img, t_mat, dsize: tuple[int, int] | None = None):
    """``cv.warpAffine(img, t_mat, dsize)``: t_mat maps src coords -> dst coords.

    ``t_mat`` is the forward 2x3 matrix; we invert it on the host (pinv of the
    3x3 homogeneous form, handling singular matrices like the reference's
    transform_img_with_tmat at shared_modules/utils.py:104-108).  Near-identity
    transforms on large planes take the gather-free tiled band path
    (ops/affine_tiled.py — TPU gathers are ~50x slower than shifted slices);
    everything else falls back to the exact bilinear gather.
    ``dsize`` is (H, W); defaults to the input shape.
    """
    img = jnp.asarray(img)
    t = np.asarray(jax.device_get(t_mat), dtype=np.float64)
    hom = np.vstack([t, [0.0, 0.0, 1.0]])
    inv = np.linalg.pinv(hom)
    out_h, out_w = dsize if dsize is not None else img.shape[:2]
    if img.ndim == 2 and jnp.issubdtype(img.dtype, jnp.floating):
        from microaligner_tpu.ops.affine_tiled import affine_warp_tiled

        out = affine_warp_tiled(img, inv[:2], int(out_h), int(out_w))
        if out is not None:
            return out
    return _affine_warp_core(img, jnp.asarray(inv[:2], jnp.float32), out_h, out_w)


def transform_img_with_tmat(img, target_shape, transform_matrix):
    """Pad to target shape then apply the affine transform, preserving dtype.

    Mirrors ``transform_img_with_tmat`` (shared_modules/utils.py:98-114):
    identity matrices skip the warp entirely; non-identity warps go through
    the pseudo-inverse + bilinear resampling path.
    """
    original_dtype = img.dtype
    img, _ = pad_to_shape(img, tuple(target_shape))
    identity = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    tm = np.asarray(jax.device_get(transform_matrix), dtype=np.float64)
    if np.array_equal(tm, identity):
        return np.asarray(jax.device_get(img)).astype(original_dtype)
    out = affine_warp(jnp.asarray(img).astype(jnp.float32), tm)
    out = np.asarray(jax.device_get(out))
    # The reference truncates via ndarray.astype after the skimage warp
    # (shared_modules/utils.py:110-112); bilinear output of a non-negative
    # image stays in range, so a plain astype matches.
    return out.astype(original_dtype)
