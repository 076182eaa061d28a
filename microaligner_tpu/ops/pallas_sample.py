"""Pallas TPU kernel: banded bilinear displacement sampling.

The single hottest memory pattern in the framework is ``out(p) = bilinear
img(p + flow(p))`` (Farneback matrix updates, tile warping, flow
composition).  The XLA formulation (ops/warp.py::_sample_banded_one) is a
scan of shifted select-FMA passes; this kernel keeps the padded tile and all
weight fields resident in VMEM and fuses the whole band accumulation into one
Mosaic program — no HBM round trips between passes.

Exact for integer displacements in [-band, band-1] (same contract as the XLA
path; callers guard with the gather fallback).  Out-of-band pixels produce 0.

Grid: (batch, row_blocks, col_blocks).  Blocks tile BOTH the sublane and the
lane axis — full-width blocks made the per-step scoped-VMEM footprint linear
in W and blew the 16 MB scoped-vmem stack limit past ~2.5k lanes (the same
failure mode as ops/pallas_poly.py / ops/pallas_matrices.py, fixed
2026-08-18; full-width dense row bands of a 20k canvas are ~20680 lanes).
Each block's (rb+2pad, cb+2pad) sample window is assembled from the four
overlapping neighbour views.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microaligner_tpu.ops.pallas_params import compiler_params

__all__ = ["pallas_sample_displaced", "pallas_sample_displaced_multi", "PALLAS_OK"]

# 16 rows per block: with the band-7 halo this gives the exact (2rb=32, ...)
# slab geometry validated on v5e in ops/pallas_matrices.py — 64-row 2-D slabs
# miscompile under Mosaic's dynamic_rotate lowering (wrong results, caught by
# the self-test gate).
_ROW_BLOCK = 16
_MULTI_VMEM_MB = 64.0  # raised scoped-VMEM limit for the multi-plane kernel:
# at n=8 planes a full-width (rb=16, cb=4352) step needs ~27 MB; v5e has
# 128 MB physical VMEM, Mosaic's 16 MB default is just a conservative cap
_COL_BLOCK = 4096  # grid-step overhead dominates this kernel (~10 us/step);
# sweep at the 20k dense-band geometry (scripts/probe_block_sizes.py, v5e
# 2026-08-19): cb 1024 -> 14.94 ms, 2048 -> 12.95 ms, 4096 -> 12.25 ms.
# VMEM stays small (4 views + out + 2 scratch at (16, 4096) f32 = ~1.8 MB).


@functools.partial(
    jax.jit, static_argnames=("band", "interpret", "col_block", "row_block")
)
def pallas_sample_displaced(
    img: jax.Array,
    fx: jax.Array,
    fy: jax.Array,
    band: int = 4,
    interpret: bool = False,
    col_block: int | None = None,
    row_block: int | None = None,
) -> jax.Array:
    """Batched single-channel banded sample.

    ``img`` (N, H, W) f32; ``fx``/``fy`` (N, H, W) f32 displacement
    components (integer/fractional split happens in kernel — saves four
    XLA-materialized field planes per call).  Returns (N, H, W) f32.
    """
    n, h, w = img.shape
    pad = band + 1
    rb = max(min(row_block or _ROW_BLOCK, h), -(-(2 * band + 1) // 8) * 8)
    rb = min(rb, h)
    if rb < 2 * band + 1:
        raise ValueError(f"pallas_sample_displaced needs H >= {2 * band + 1}, got {h}")
    cb = min(col_block or _COL_BLOCK, -(-w // 128) * 128)
    hpad = (-h) % rb
    wpad = (-w) % cb
    hp, wp = h + hpad, w + wpad
    # `pad` halo on top/left; bottom/right slack so the (r+1)/(c+1) neighbour
    # block views stay in bounds for the last output block.  Lane blocks are
    # 128-aligned by construction (cb % 128 == 0).
    imgp = jnp.pad(img, ((0, 0), (pad, pad + hpad + rb), (pad, wp + cb - w - pad)))
    if hpad or wpad:
        zs = ((0, 0), (0, hpad), (0, wpad))
        fx = jnp.pad(fx, zs)
        fy = jnp.pad(fy, zs)
    grid = (n, hp // rb, wp // cb)

    field_spec = pl.BlockSpec(
        (1, rb, cb), lambda i, r, s: (i, r, s), memory_space=pltpu.VMEM
    )
    img_views = [
        pl.BlockSpec((1, rb, cb), lambda i, r, s: (i, r, s), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rb, cb), lambda i, r, s: (i, r + 1, s), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rb, cb), lambda i, r, s: (i, r, s + 1), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rb, cb), lambda i, r, s: (i, r + 1, s + 1), memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        functools.partial(_kernel_batched, band, rb, cb),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp), jnp.float32),
        grid=grid,
        in_specs=img_views + [field_spec, field_spec],
        out_specs=field_spec,
        scratch_shapes=[
            pltpu.VMEM((rb, cb), jnp.float32),
            pltpu.VMEM((rb, cb), jnp.float32),
        ],
        # every grid step is independent (scratch is reset per step): parallel
        # semantics let Mosaic overlap the block pipeline across steps
        compiler_params=compiler_params("parallel", "parallel", "parallel"),
        interpret=interpret,
    )(imgp, imgp, imgp, imgp, fx, fy)
    return out[:, :h, :w]


def _kernel_batched(
    band, row_block, cb, a_ref, b_ref, a2_ref, b2_ref, fx_ref, fy_ref,
    out_ref, acc_ref, cd_ref,
):
    """Leading singleton batch dim from the BlockSpecs; squeeze and compute.

    The row loop runs with DYNAMIC bounds (the block's displacement spread,
    clamped to the band); the unrolled column offsets are gated by SCALAR
    range compares — real flows are sub-pixel almost everywhere, so the
    (2band+1)² sweep collapses to the few offsets actually present without
    paying a weight plane + any-reduction per absent offset.
    """
    pad = band + 1
    fx = fx_ref[0]
    fy = fy_ref[0]
    dxi = jnp.floor(fx).astype(jnp.int32)
    dyi = jnp.floor(fy).astype(jnp.int32)
    tx = fx - dxi.astype(jnp.float32)
    ty = fy - dyi.astype(jnp.float32)

    dy_lo = jnp.maximum(jnp.min(dyi), -band)
    dy_hi = jnp.minimum(jnp.max(dyi), band - 1)
    dx_lo = jnp.maximum(jnp.min(dxi), -band)
    dx_hi = jnp.minimum(jnp.max(dxi), band - 1)

    acc_ref[...] = jnp.zeros((row_block, cb), jnp.float32)

    # Both offset loops are STATIC unrolls gated by scalar range compares;
    # row windows are STATIC sublane slices read from the neighbour refs
    # (no dynamic rotate — rolling a staged slab per executed row offset was
    # the hottest operation; static ref windows are free).  The left/right
    # column halves are concatenated along lanes, then column windows are
    # static lane slices (dynamic lane rotates miscompile past one 128-lane
    # tile on v5e).
    def row_window(top_ref, bot_ref, lo):
        if lo + row_block <= row_block:  # window fully in the first block
            return top_ref[0, lo : lo + row_block, :]
        if lo >= row_block:  # fully in the second block
            return bot_ref[0, lo - row_block : lo, :]
        # straddles: static concat of the two ref windows
        return jnp.concatenate([top_ref[0, lo:, :], bot_ref[0, : lo, :]], axis=0)

    for d in range(-band, band + 1):
        @pl.when((d >= dy_lo) & (d <= dy_hi + 1))
        def _row(d=d):
            wy = jnp.where(dyi == d, 1.0 - ty, jnp.where(dyi == d - 1, ty, 0.0))
            lo = pad + d
            rows = jnp.concatenate(
                [row_window(a_ref, b_ref, lo), row_window(a2_ref, b2_ref, lo)],
                axis=1,
            )  # (rb, 2cb): the block's lanes [c*cb - pad .. c*cb + 2cb - pad)
            cd_ref[...] = jnp.zeros((row_block, cb), jnp.float32)

            for e in range(-band, band + 1):
                @pl.when((e >= dx_lo) & (e <= dx_hi + 1))
                def _col(e=e, rows=rows):
                    wx = jnp.where(dxi == e, 1.0 - tx, jnp.where(dxi == e - 1, tx, 0.0))
                    seg = jax.lax.slice_in_dim(rows, pad + e, pad + e + cb, axis=1)
                    cd_ref[...] += wx * seg

            acc_ref[...] += wy * cd_ref[...]

    out_ref[0] = acc_ref[...]


@functools.partial(
    jax.jit, static_argnames=("band", "interpret", "col_block", "row_block")
)
def pallas_sample_displaced_multi(
    imgs: jax.Array,
    fx: jax.Array,
    fy: jax.Array,
    band: int = 4,
    interpret: bool = False,
    col_block: int | None = None,
    row_block: int | None = None,
) -> jax.Array:
    """Banded sample of N planes sharing ONE displacement field.

    ``imgs`` (N, H, W) f32; ``fx``/``fy`` (H, W) f32.  Returns (N, H, W) f32.

    The z-stack apply (reference __main__.py:288-302: every channel/z plane of
    a cycle warped by the same flow) is the production shape: the per-offset
    weight fields depend only on the flow, so computing them once per block
    and broadcasting the FMA over the plane axis removes the dominant
    per-plane cost of N independent ``pallas_sample_displaced`` calls."""
    n, h, w = imgs.shape
    pad = band + 1
    rb = max(min(row_block or _ROW_BLOCK, h), -(-(2 * band + 1) // 8) * 8)
    rb = min(rb, h)
    if rb < 2 * band + 1:
        raise ValueError(f"pallas_sample_displaced_multi needs H >= {2 * band + 1}, got {h}")
    # VMEM budget: Mosaic double-buffers the grid-streamed blocks, so the
    # per-step footprint is (4 views + out) x 2 + 2 scratch = 12 blocks of
    # (n, rb, cb) f32 (verified on hardware: the 8x4096^2 z-stack shape
    # failed at exactly 12 x blocksize with a 7-block divisor), plus the two
    # small field planes; size against ~3/4 of the (raised) scoped limit.
    # Unlike the single-plane kernel this one prefers FULL-WIDTH blocks: the
    # weight fields amortize over n planes, so fewer/wider grid steps win,
    # and a raised scoped-VMEM limit (v5e has 128 MB physical) admits them.
    from microaligner_tpu.ops.pallas_params import vmem_budget_bytes

    cb_fit = int(vmem_budget_bytes(_MULTI_VMEM_MB) / (12 * n * rb * 4)) // 128 * 128
    cb = min(col_block or max(cb_fit, 128), max(cb_fit, 128), -(-w // 128) * 128)
    hpad = (-h) % rb
    wpad = (-w) % cb
    hp, wp = h + hpad, w + wpad
    imgp = jnp.pad(imgs, ((0, 0), (pad, pad + hpad + rb), (pad, wp + cb - w - pad)))
    if hpad or wpad:
        zs = ((0, hpad), (0, wpad))
        fx = jnp.pad(fx, zs)
        fy = jnp.pad(fy, zs)
    grid = (hp // rb, wp // cb)

    field_spec = pl.BlockSpec(
        (rb, cb), lambda r, s: (r, s), memory_space=pltpu.VMEM
    )
    img_views = [
        pl.BlockSpec((n, rb, cb), lambda r, s: (0, r, s), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, rb, cb), lambda r, s: (0, r + 1, s), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, rb, cb), lambda r, s: (0, r, s + 1), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, rb, cb), lambda r, s: (0, r + 1, s + 1), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec(
        (n, rb, cb), lambda r, s: (0, r, s), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel_multi, band, rb, cb),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp), jnp.float32),
        grid=grid,
        in_specs=img_views + [field_spec, field_spec],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((n, rb, cb), jnp.float32),
            pltpu.VMEM((n, rb, cb), jnp.float32),
        ],
        compiler_params=compiler_params(
            "parallel", "parallel", vmem_mb=_MULTI_VMEM_MB
        ),
        interpret=interpret,
    )(imgp, imgp, imgp, imgp, fx, fy)
    return out[:, :h, :w]


def _kernel_multi(
    band, row_block, cb, a_ref, b_ref, a2_ref, b2_ref, fx_ref, fy_ref,
    out_ref, acc_ref, cd_ref,
):
    """Same banded structure as ``_kernel_batched`` with the plane axis kept
    whole per block: the (d, e) weight planes are computed ONCE from the
    shared flow and broadcast over the N-plane FMA."""
    pad = band + 1
    fx = fx_ref[...]
    fy = fy_ref[...]
    dxi = jnp.floor(fx).astype(jnp.int32)
    dyi = jnp.floor(fy).astype(jnp.int32)
    tx = fx - dxi.astype(jnp.float32)
    ty = fy - dyi.astype(jnp.float32)

    dy_lo = jnp.maximum(jnp.min(dyi), -band)
    dy_hi = jnp.minimum(jnp.max(dyi), band - 1)
    dx_lo = jnp.maximum(jnp.min(dxi), -band)
    dx_hi = jnp.minimum(jnp.max(dxi), band - 1)

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def row_window(top_ref, bot_ref, lo):
        if lo + row_block <= row_block:
            return top_ref[:, lo : lo + row_block, :]
        if lo >= row_block:
            return bot_ref[:, lo - row_block : lo, :]
        return jnp.concatenate([top_ref[:, lo:, :], bot_ref[:, : lo, :]], axis=1)

    for d in range(-band, band + 1):
        @pl.when((d >= dy_lo) & (d <= dy_hi + 1))
        def _row(d=d):
            wy = jnp.where(dyi == d, 1.0 - ty, jnp.where(dyi == d - 1, ty, 0.0))
            lo = pad + d
            rows = jnp.concatenate(
                [row_window(a_ref, b_ref, lo), row_window(a2_ref, b2_ref, lo)],
                axis=2,
            )  # (n, rb, 2cb)
            cd_ref[...] = jnp.zeros_like(cd_ref)

            for e in range(-band, band + 1):
                @pl.when((e >= dx_lo) & (e <= dx_hi + 1))
                def _col(e=e, rows=rows):
                    wx = jnp.where(dxi == e, 1.0 - tx, jnp.where(dxi == e - 1, tx, 0.0))
                    seg = jax.lax.slice_in_dim(rows, pad + e, pad + e + cb, axis=2)
                    cd_ref[...] += wx[None] * seg

            acc_ref[...] += wy[None] * cd_ref[...]

    out_ref[...] = acc_ref[...]


def _self_test() -> bool:
    """Compile-and-compare smoke test on the current default backend.

    Runs on a fresh thread: the gate fires lazily, often inside an outer jit
    trace, and trace state is thread-local (utils/selftest.py).
    """
    from microaligner_tpu.utils.selftest import run_outside_trace

    return run_outside_trace(_self_test_body)


def _self_test_body() -> bool:
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 256, 256)), jnp.float32)
    # displacements span most of the production band (ops/warp.py uses 7)
    flow = (rng.random((2, 256, 256, 2)) - 0.5) * 13
    fx = jnp.asarray(flow[..., 0], jnp.float32)
    fy = jnp.asarray(flow[..., 1], jnp.float32)
    # col_block=128 exercises the lane-blocked multi-column grid on hardware
    out = np.asarray(pallas_sample_displaced(img, fx, fy, band=7, col_block=128))
    # compare against the XLA banded path directly (NOT the public
    # dispatcher, which consults pallas_available -> would recurse)
    from microaligner_tpu.ops.warp import _sample_banded_one

    ref = np.asarray(
        jax.jit(
            jax.vmap(lambda i, f: _sample_banded_one(i, f, 7))
        )(img[..., None], jnp.asarray(flow, jnp.float32))
    )[..., 0]
    return bool(np.allclose(out, ref, atol=1e-5))


PALLAS_OK: bool | None = None  # resolved lazily by pallas_available()


def pallas_available() -> bool:
    """True when the Mosaic kernel compiles and matches the XLA path here."""
    global PALLAS_OK
    if PALLAS_OK is None:
        PALLAS_OK = _self_test()
    return PALLAS_OK


def _multi_self_test_body() -> bool:
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.random((3, 256, 256)), jnp.float32)
    flow = (rng.random((256, 256, 2)) - 0.5) * 13
    fx = jnp.asarray(flow[..., 0], jnp.float32)
    fy = jnp.asarray(flow[..., 1], jnp.float32)
    out = np.asarray(
        pallas_sample_displaced_multi(imgs, fx, fy, band=7, col_block=128)
    )
    from microaligner_tpu.ops.warp import _sample_banded_one

    fl = jnp.asarray(flow, jnp.float32)
    ref = np.asarray(
        jax.jit(jax.vmap(lambda i: _sample_banded_one(i[..., None], fl, 7)))(imgs)
    )[..., 0]
    return bool(np.allclose(out, ref, atol=1e-5))


PALLAS_MULTI_OK: bool | None = None


def pallas_multi_available() -> bool:
    """Gate for the shared-flow multi-plane kernel (compile-and-compare)."""
    global PALLAS_MULTI_OK
    if PALLAS_MULTI_OK is None:
        from microaligner_tpu.utils.selftest import run_outside_trace

        PALLAS_MULTI_OK = run_outside_trace(_multi_self_test_body)
    return PALLAS_MULTI_OK
