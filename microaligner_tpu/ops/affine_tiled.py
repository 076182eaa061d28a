"""Gather-free tiled affine warp for near-identity transforms.

``cv.warpAffine`` / ``skimage.transform.warp`` (reference call sites
feature_registrator.py:118-132, shared_modules/utils.py:98-114) are a full
bilinear gather on TPU — ~50x slower than shifted-slice sampling because XLA
lowers arbitrary gathers to scalar loads.  Registration transforms, however,
are near-identity: the displacement field ``A·p - p`` varies slowly, so over
a tile it stays within a small band around the tile-center displacement.

The scheme (all matrix math host-side — the transform is host-known):

1. pick the largest tile size whose worst-case *residual* displacement
   (linear part of ``A - I`` across a window, plus 0.5 px of center rounding)
   fits the banded sampler's static band;
2. for each output tile, slice a halo-expanded source *window* displaced by
   the rounded tile-center displacement (a ``dynamic_slice`` — a block copy,
   not a gather; the canvas is zero-padded so every window is in bounds and
   out-of-image taps read 0, like BORDER_CONSTANT);
3. sample each window with the banded displacement kernel
   (``sample_displaced_batched`` — the Pallas TPU kernel when available)
   using the residual field, which is linear in window coords;
4. stitch window interiors (tile axis sharded over the worker mesh).

If no tile size satisfies the band contract (strong rotation/scale), the
caller falls back to the exact gather.  Numerically the windowed path is
*more* accurate than the global gather at 20k scale: residual coordinates
stay small, so f32 quantization (~1.2e-3 px at coordinate 2e4) never enters.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from microaligner_tpu.tiles import TileGrid, stitch_tiles

__all__ = [
    "plan_affine_tiled",
    "affine_warp_tiled",
    "affine_warp_traced",
    "AffinePlan",
]

_BAND = 4
_TILE_CANDIDATES = (1024, 512, 256, 128)
_TILE_BATCH = 8
_MIN_DIM = 256  # below this the whole image is one small gather; not worth it


@dataclasses.dataclass
class AffinePlan:
    """Host-side execution plan: static geometry + runtime arrays."""

    grid: TileGrid
    pads: tuple  # (top, bottom, left, right) canvas zero-padding, bucketed
    starts: np.ndarray  # (N, 2) int32 window origins (y, x) in canvas coords
    cvals: np.ndarray  # (N, 2) f32 residual-flow constants (x, y) per tile
    mvec: np.ndarray  # (4,) f32 [M00, M01, M10, M11] of M = A - I
    band: int


def _bucket_pad(x: int) -> int:
    """Round a pad up to a power of two so jit retraces stay bounded."""
    if x <= 0:
        return 0
    return 1 << int(np.ceil(np.log2(max(x, 8))))


def plan_affine_tiled(inv: np.ndarray, out_h: int, out_w: int, band: int = _BAND):
    """Build an execution plan for ``dst(p) = src(inv · p)`` or return None.

    ``inv`` is the host 2x3 inverse matrix mapping dst (x, y) -> src (x, y)
    (the matrix ``_affine_warp_core`` consumes).  Returns None when the band
    contract cannot be met (transform too far from identity) or the image is
    too small to bother.
    """
    if min(out_h, out_w) < _MIN_DIM:
        return None
    inv = np.asarray(inv, dtype=np.float64)
    A = inv[:, :2]
    t = inv[:, 2]
    M = A - np.eye(2)
    halo = band + 1

    tile = None
    for cand in _TILE_CANDIDATES:
        if cand > min(out_h, out_w):
            continue
        win = cand + 2 * halo
        r = (win - 1) / 2.0
        bx = (abs(M[0, 0]) + abs(M[0, 1])) * r + 0.5
        by = (abs(M[1, 0]) + abs(M[1, 1])) * r + 0.5
        # floor(flow) must land in [-band, band-1] => |flow| <= band - 1
        if bx <= band - 1 and by <= band - 1:
            tile = cand
            break
    if tile is None:
        return None

    grid = TileGrid.for_image((out_h, out_w), tile, halo)
    win_h, win_w = grid.tile_shape

    jj, ii = np.meshgrid(np.arange(grid.nx), np.arange(grid.ny))
    ox = (jj * grid.tile_w).astype(np.float64).ravel()  # tile origins, global
    oy = (ii * grid.tile_h).astype(np.float64).ravel()
    # window center in global output coords
    gx_c = ox - halo + (win_w - 1) / 2.0
    gy_c = oy - halo + (win_h - 1) / 2.0
    src_x_c = A[0, 0] * gx_c + A[0, 1] * gy_c + t[0]
    src_y_c = A[1, 0] * gx_c + A[1, 1] * gy_c + t[1]
    dcx = np.rint(src_x_c - gx_c)
    dcy = np.rint(src_y_c - gy_c)
    start_x = ox - halo + dcx  # window origin in source-image coords
    start_y = oy - halo + dcy

    p_top = _bucket_pad(int(-start_y.min()))
    p_left = _bucket_pad(int(-start_x.min()))
    p_bot = _bucket_pad(int(start_y.max() + win_h - out_h))
    p_right = _bucket_pad(int(start_x.max() + win_w - out_w))
    if max(p_top, p_left, p_bot, p_right) > 2 * max(out_h, out_w):
        return None  # absurd translation; the gather fallback handles it

    # residual flow over a window: flow_x = M00*wx + M01*wy + c_x (and y alike)
    c_x = A[0, 0] * (ox - halo) + A[0, 1] * (oy - halo) + t[0] - start_x
    c_y = A[1, 0] * (ox - halo) + A[1, 1] * (oy - halo) + t[1] - start_y

    starts = np.stack([start_y + p_top, start_x + p_left], axis=-1).astype(np.int32)
    cvals = np.stack([c_x, c_y], axis=-1).astype(np.float32)
    mvec = np.array([M[0, 0], M[0, 1], M[1, 0], M[1, 1]], dtype=np.float32)
    return AffinePlan(grid, (p_top, p_bot, p_left, p_right), starts, cvals, mvec, band)


@functools.partial(jax.jit, static_argnames=("grid", "pads", "band", "mesh"))
def _affine_tiled_exec(img, starts, cvals, mvec, grid, pads, band, mesh):
    from microaligner_tpu.ops.warp import sample_displaced_batched
    from microaligner_tpu.parallel.tile_runner import tile_map

    p_top, p_bot, p_left, p_right = pads
    canvas = jnp.pad(img.astype(jnp.float32), ((p_top, p_bot), (p_left, p_right)))
    win_h, win_w = grid.tile_shape

    def chunk(st, cv, canvas_, mv):
        def get_win(s):
            return jax.lax.dynamic_slice(canvas_, (s[0], s[1]), (win_h, win_w))

        wins = jax.lax.map(get_win, st)  # sequential block copies, no gather
        wy = jax.lax.broadcasted_iota(jnp.float32, (win_h, win_w), 0)
        wx = jax.lax.broadcasted_iota(jnp.float32, (win_h, win_w), 1)
        fx = mv[0] * wx + mv[1] * wy + cv[:, 0][:, None, None]
        fy = mv[2] * wx + mv[3] * wy + cv[:, 1][:, None, None]
        flows = jnp.stack([fx, fy], axis=-1)
        out = sample_displaced_batched(wins[..., None], flows, band)
        return out[..., 0]

    tiles = tile_map(
        chunk, (starts, cvals), batch=_TILE_BATCH, mesh=mesh,
        broadcast=(canvas, mvec),
    )
    return stitch_tiles(tiles, grid)


_TRACED_PAD = 256  # static canvas pad of the traced path; |translation| beyond
#                    this (rare at registration scale) takes the gather branch
_TRACED_BATCH = 8


def affine_warp_traced(img: jax.Array, fwd: jax.Array, band: int = _BAND) -> jax.Array:
    """Fully-traced ``cv.warpAffine``: ``fwd`` is a TRACED (2, 3) forward
    matrix (src -> dst), output matches ``img``'s (H, W) in float32.

    The host-planned path (``affine_warp_tiled``) needs the matrix on the host
    to choose tile size and padding; inside a fused jit program the matrix is
    a traced value, so this variant fixes the geometry statically (tile from
    the image size, canvas pad ``_TRACED_PAD``) and decides banded-vs-gather
    with ONE ``lax.cond`` at runtime: near-identity transforms run the
    dc-shifted windowed block-copy + banded-sampler path; everything else
    (strong rotation, huge translation, singular matrix) takes the exact
    bilinear gather.  Zero-outside sampling either way (BORDER_CONSTANT).
    """
    out_h, out_w = int(img.shape[0]), int(img.shape[1])
    src = img.astype(jnp.float32)

    # traced inverse via the adjugate; a singular forward matrix routes to the
    # gather branch, which then samples with the zeroed inverse -> constant
    # image, same as the reference's pinv degenerate output shape-wise
    a, b, tx = fwd[0, 0], fwd[0, 1], fwd[0, 2]
    c, d, ty = fwd[1, 0], fwd[1, 1], fwd[1, 2]
    det = a * d - b * c
    nonsingular = jnp.abs(det) > 1e-12
    idet = jnp.where(nonsingular, 1.0 / jnp.where(nonsingular, det, 1.0), 0.0)
    ia, ib = d * idet, -b * idet
    ic, id_ = -c * idet, a * idet
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)

    def gather_branch(_):
        gx = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
        gy = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
        from microaligner_tpu.ops.warp import bilinear_remap

        return bilinear_remap(src, ia * gx + ib * gy + itx, ic * gx + id_ * gy + ity)

    tile = None
    for cand in _TILE_CANDIDATES:
        if cand <= min(out_h, out_w):
            tile = cand
            break
    if tile is None or min(out_h, out_w) < _MIN_DIM:
        return gather_branch(None)

    halo = band + 1
    grid = TileGrid.for_image((out_h, out_w), tile, halo)
    win_h, win_w = grid.tile_shape

    m00, m01 = ia - 1.0, ib
    m10, m11 = ic, id_ - 1.0
    r = (max(win_h, win_w) - 1) / 2.0
    bx = (jnp.abs(m00) + jnp.abs(m01)) * r + 0.5
    by = (jnp.abs(m10) + jnp.abs(m11)) * r + 0.5

    jj, ii = np.meshgrid(np.arange(grid.nx), np.arange(grid.ny))
    ox = jnp.asarray((jj * grid.tile_w).ravel(), jnp.float32)
    oy = jnp.asarray((ii * grid.tile_h).ravel(), jnp.float32)
    gx_c = ox - halo + (win_w - 1) / 2.0
    gy_c = oy - halo + (win_h - 1) / 2.0
    src_x_c = ia * gx_c + ib * gy_c + itx
    src_y_c = ic * gx_c + id_ * gy_c + ity
    dcx = jnp.rint(src_x_c - gx_c)
    dcy = jnp.rint(src_y_c - gy_c)
    start_x = ox - halo + dcx + _TRACED_PAD
    start_y = oy - halo + dcy + _TRACED_PAD
    ch = out_h + 2 * _TRACED_PAD
    cw = out_w + 2 * _TRACED_PAD
    in_bounds = (
        (start_x >= 0) & (start_x + win_w <= cw)
        & (start_y >= 0) & (start_y + win_h <= ch)
    )
    ok = (
        nonsingular
        & (bx <= band - 1) & (by <= band - 1)
        & jnp.all(in_bounds)
    )

    c_x = ia * (ox - halo) + ib * (oy - halo) + itx - (start_x - _TRACED_PAD)
    c_y = ic * (ox - halo) + id_ * (oy - halo) + ity - (start_y - _TRACED_PAD)
    starts = jnp.stack([start_y, start_x], axis=-1).astype(jnp.int32)
    cvals = jnp.stack([c_x, c_y], axis=-1).astype(jnp.float32)

    n = grid.num_tiles
    nb = -(-n // _TRACED_BATCH) * _TRACED_BATCH

    def tiled_branch(_):
        from microaligner_tpu.ops.warp import sample_displaced_batched

        canvas = jnp.pad(src, _TRACED_PAD)
        st = jnp.concatenate([starts, jnp.zeros((nb - n, 2), jnp.int32)])
        cv = jnp.concatenate([cvals, jnp.zeros((nb - n, 2), jnp.float32)])
        st = st.reshape(nb // _TRACED_BATCH, _TRACED_BATCH, 2)
        cv = cv.reshape(nb // _TRACED_BATCH, _TRACED_BATCH, 2)

        def chunk(args):
            s, cvv = args
            wins = jax.lax.map(
                lambda ss: jax.lax.dynamic_slice(canvas, (ss[0], ss[1]), (win_h, win_w)),
                s,
            )
            wy = jax.lax.broadcasted_iota(jnp.float32, (win_h, win_w), 0)
            wx = jax.lax.broadcasted_iota(jnp.float32, (win_h, win_w), 1)
            fx = m00 * wx + m01 * wy + cvv[:, 0][:, None, None]
            fy = m10 * wx + m11 * wy + cvv[:, 1][:, None, None]
            flows = jnp.stack([fx, fy], axis=-1)
            return sample_displaced_batched(wins[..., None], flows, band)[..., 0]

        tiles = jax.lax.map(chunk, (st, cv)).reshape(nb, win_h, win_w)[:n]
        return stitch_tiles(tiles, grid)

    return jax.lax.cond(ok, tiled_branch, gather_branch, None)


def affine_warp_tiled(img: jax.Array, inv: np.ndarray, out_h: int, out_w: int):
    """Gather-free ``dst(p) = bilinear src(inv · p)`` or None if out of contract.

    ``img`` is the (out_h, out_w)-or-smaller source plane (any float dtype);
    output is f32.  ``inv`` is the host-side 2x3 dst->src matrix.
    """
    if img.shape[0] > out_h or img.shape[1] > out_w:
        # dsize smaller than the source: the windowed plan assumes the canvas
        # covers the image; let the exact gather handle the crop (ADVICE r2)
        return None
    plan = plan_affine_tiled(inv, out_h, out_w)
    if plan is None:
        return None
    from microaligner_tpu.parallel.tile_runner import current_tile_mesh

    if img.shape != (out_h, out_w):
        img = jnp.pad(
            img, ((0, out_h - img.shape[0]), (0, out_w - img.shape[1]))
        )
    return _affine_tiled_exec(
        img,
        jnp.asarray(plan.starts),
        jnp.asarray(plan.cvals),
        jnp.asarray(plan.mvec),
        plan.grid,
        plan.pads,
        plan.band,
        current_tile_mesh(),
    )
