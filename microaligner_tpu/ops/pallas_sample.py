"""Pallas TPU kernel: banded bilinear displacement sampling.

The single hottest memory pattern in the framework is ``out(p) = bilinear
img(p + flow(p))`` (Farneback matrix updates, tile warping, flow
composition).  The XLA formulation (ops/warp.py::_sample_banded_one) is a
scan of shifted select-FMA passes; this kernel keeps the padded tile and all
weight fields resident in VMEM and fuses the whole band accumulation into one
Mosaic program — no HBM round trips between passes.

Exact for integer displacements in [-band, band-1] (same contract as the XLA
path; callers guard with the gather fallback).  Out-of-band pixels produce 0.

Grid: (batch, row_blocks).  Per step the kernel sees the full padded tile
(revisited blocks are not re-fetched) plus one row-block of the displacement
fields.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_sample_displaced", "PALLAS_OK"]

# 16 rows per block: with the band-7 halo this gives the exact (2rb=32, wal)
# slab geometry validated on v5e in ops/pallas_matrices.py — 64-row 2-D slabs
# miscompile under Mosaic's dynamic_rotate lowering (wrong results, caught by
# the self-test gate).
_ROW_BLOCK = 16


@functools.partial(jax.jit, static_argnames=("band", "interpret"))
def pallas_sample_displaced(
    img: jax.Array,
    fx: jax.Array,
    fy: jax.Array,
    band: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """Batched single-channel banded sample.

    ``img`` (N, H, W) f32; ``fx``/``fy`` (N, H, W) f32 displacement
    components (integer/fractional split happens in kernel — saves four
    XLA-materialized field planes per call).  Returns (N, H, W) f32.
    """
    n, h, w = img.shape
    pad = band + 1
    rb = max(min(_ROW_BLOCK, h), -(-(2 * band + 1) // 8) * 8)
    rb = min(rb, h)
    if rb < 2 * band + 1:
        raise ValueError(f"pallas_sample_displaced needs H >= {2 * band + 1}, got {h}")
    hpad = (-h) % rb
    # rows: `pad` halo on top, `pad + hpad + rb` on the bottom so the second
    # row-block view (r+1) stays in bounds for the last output block.  Lanes:
    # `pad` halo left, right halo rounded so the slab lane count is
    # 128-aligned (the dynamic lane rotate requires an aligned shape).
    wal = -(-(w + 2 * pad) // 128) * 128
    imgp = jnp.pad(img, ((0, 0), (pad, pad + hpad + rb), (pad, wal - w - pad)))
    if hpad:
        zs = ((0, 0), (0, hpad), (0, 0))
        fx = jnp.pad(fx, zs)
        fy = jnp.pad(fy, zs)
    hp = h + hpad
    grid = (n, hp // rb)

    field_spec = pl.BlockSpec((1, rb, w), lambda i, r: (i, r, 0), memory_space=pltpu.VMEM)
    # the image is passed twice with consecutive row-block views; their concat
    # covers the rb + 2*pad rows each output block needs (overlapping windows
    # aren't expressible with one BlockSpec), keeping VMEM per step ~1 MB
    img_spec_a = pl.BlockSpec((1, rb, wal), lambda i, r: (i, r, 0), memory_space=pltpu.VMEM)
    img_spec_b = pl.BlockSpec((1, rb, wal), lambda i, r: (i, r + 1, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_batched, band, rb),
        out_shape=jax.ShapeDtypeStruct((n, hp, w), jnp.float32),
        grid=grid,
        in_specs=[img_spec_a, img_spec_b, field_spec, field_spec],
        out_specs=field_spec,
        scratch_shapes=[
            pltpu.VMEM((rb, w), jnp.float32),
            pltpu.VMEM((rb, w), jnp.float32),
        ],
        interpret=interpret,
    )(imgp, imgp, fx, fy)
    return out[:, :h, :]


def _kernel_batched(
    band, row_block, img_a_ref, img_b_ref, fx_ref, fy_ref,
    out_ref, acc_ref, cd_ref,
):
    """Leading singleton batch dim from the BlockSpecs; squeeze and compute.

    The row loop runs with DYNAMIC bounds (the block's displacement spread,
    clamped to the band); the unrolled column offsets are gated by SCALAR
    range compares — real flows are sub-pixel almost everywhere, so the
    (2band+1)² sweep collapses to the few offsets actually present without
    paying a weight plane + any-reduction per absent offset.
    """
    w = out_ref.shape[2]
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

    acc_ref[...] = jnp.zeros((row_block, w), jnp.float32)

    # Both offset loops are STATIC unrolls gated by scalar range compares;
    # row windows are STATIC sublane slices read from the two row-block refs
    # (no dynamic rotate — rolling the slab per executed row offset was the
    # hottest operation; static ref windows are free).  Column windows are
    # static lane slices (dynamic lane rotates miscompile past one 128-lane
    # tile on v5e).
    for d in range(-band, band + 1):
        @pl.when((d >= dy_lo) & (d <= dy_hi + 1))
        def _row(d=d):
            wy = jnp.where(dyi == d, 1.0 - ty, jnp.where(dyi == d - 1, ty, 0.0))
            lo = pad + d
            if lo + row_block <= row_block:  # window fully in the first block
                rows = img_a_ref[0, lo : lo + row_block, :]
            elif lo >= row_block:  # fully in the second block
                rows = img_b_ref[0, lo - row_block : lo, :]
            else:  # straddles: static concat of the two ref windows
                rows = jnp.concatenate(
                    [img_a_ref[0, lo:, :], img_b_ref[0, : lo, :]], axis=0
                )
            cd_ref[...] = jnp.zeros((row_block, w), jnp.float32)

            for e in range(-band, band + 1):
                @pl.when((e >= dx_lo) & (e <= dx_hi + 1))
                def _col(e=e, rows=rows):
                    wx = jnp.where(dxi == e, 1.0 - tx, jnp.where(dxi == e - 1, tx, 0.0))
                    seg = jax.lax.slice_in_dim(rows, pad + e, pad + e + w, axis=1)
                    cd_ref[...] += wx * seg

            acc_ref[...] += wy * cd_ref[...]

    out_ref[0] = acc_ref[...]


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
    out = np.asarray(pallas_sample_displaced(img, fx, fy, band=7))
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
