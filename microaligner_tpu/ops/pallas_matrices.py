"""Pallas TPU kernel: fused Farneback matrix update.

Each Farneback iteration after the first must bilinearly sample the 5-channel
polynomial expansion R1 at p + flow(p) and combine it with R0 into the
displacement normal equations M (reference compute: the FarnebackUpdateMatrices
stage behind cv.calcOpticalFlowFarneback, driven from optflow_reg/flow_calc.py).
Done as separate XLA ops this costs ~230 ms per iteration at 25x1200^2 tiles —
the banded select-FMA sampling and the elementwise combine each make a full
HBM round trip per channel.  This kernel keeps one row-block of all five
channels of R0/R1 plus the flow fields resident in VMEM and emits M directly:
one HBM read per input plane, one write per output plane.

The floor/frac displacement decomposition happens IN KERNEL from the raw
flow (saves four XLA-materialized field planes per update), and both offset
loops are gated by per-block scalar displacement ranges — computing a weight
plane + a vector any-reduction for all 2band+1 column offsets per row offset
(the previous scheme) cost ~45 full-block VPU passes even when the block's
displacement spread was 2; scalar range checks skip absent offsets for the
price of a flag compare.

Banded contract (same as ops/pallas_sample.py): exact when every integer
displacement lies in [-band, band-1] or the 2x2 stencil falls fully outside
the image (those pixels take the border branch of the combine).  Callers
guard with the exact gather fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microaligner_tpu.ops.pallas_params import compiler_params

__all__ = ["pallas_update_matrices"]

_ROW_BLOCK = 16  # measured best on v5e: rb=32 is ~18% SLOWER (the dynamic
# sublane roll over the doubled slab costs more than the halved block count)
_COL_BLOCK = 2048  # lane blocking keeps scoped VMEM constant in image width
# (full-width blocks exceeded the 16 MB scoped-vmem stack past ~2.3k lanes —
# same failure mode as ops/pallas_poly.py, fixed 2026-08-18).  2048 measured
# 22.95 ms vs 24.53 ms at 1024 on the 20k dense-band geometry (1256x20680,
# scripts/probe_block_sizes.py, v5e 2026-08-19); 4096 fails to compile
# (scoped-VMEM: the (5, 2rb, 2cb) slab alone is 5.2 MB).
# OpenCV's border down-weighting of the displacement equations, outer 5 px
# (must match optflow/farneback.py::_BORDER_SCALE).
_BORDER = 5


def _edge_scale(i, size):
    lead = jnp.where(i < _BORDER, jnp.where(i <= 1, 0.14, 0.4472), 1.0)
    ti = size - 1 - i
    trail = jnp.where(ti < _BORDER, jnp.where(ti <= 1, 0.14, 0.4472), 1.0)
    return lead * trail


@functools.partial(
    jax.jit, static_argnames=("band", "interpret", "out_dtype", "col_block")
)
def pallas_update_matrices(
    R0: jax.Array,
    R1: jax.Array,
    fx: jax.Array,
    fy: jax.Array,
    band: int = 4,
    interpret: bool = False,
    out_dtype=jnp.float32,
    col_block: int | None = None,
) -> jax.Array:
    """Fused banded-sample + matrix combine.

    ``R0``/``R1`` are (N, 5, H, W) polynomial expansions in f32 or bf16
    (bf16 storage halves the stage's dominant HBM read — R1 is fetched four
    times per block via the overlapping neighbour views; see
    farneback._r_storage_dtype); loads are converted to f32 in VMEM, so all
    arithmetic is f32 either way.  ``fx``/``fy`` are (N, H, W) float32 flow
    components (integer/fractional split happens in kernel).  Returns
    M = (N, 5, H, W) channels [G11,G12,G22,h1,h2] in ``out_dtype`` (see
    farneback._m_storage_dtype).  Requires H >= 2*band + 1 (callers gate on
    this).
    """
    n, c, h, w = R0.shape
    assert c == 5
    pad = band + 1
    # the row block must cover the band's roll range; round to sublanes
    rb = max(_ROW_BLOCK, -(-(2 * band + 1) // 8) * 8)
    rb = min(rb, h)
    if rb < 2 * band + 1:
        raise ValueError(f"pallas_update_matrices needs H >= {2 * band + 1}, got {h}")
    cb = min(col_block or _COL_BLOCK, -(-w // 128) * 128)
    hpad = (-h) % rb
    wpad = (-w) % cb
    hp, wp = h + hpad, w + wpad
    # R1: `pad` halo on top/left; bottom/right slack so the (r+1)/(c+1)
    # neighbour block views stay in bounds for the last output block.  The
    # four overlapping views assemble each block's (rb+2pad, cb+2pad) sample
    # window in VMEM — overlapping windows aren't expressible with one
    # BlockSpec.  Lane blocks are 128-aligned by construction (cb % 128 == 0),
    # which the dynamic sublane rotate in the kernel requires.
    R1p = jnp.pad(
        R1, ((0, 0), (0, 0), (pad, pad + hpad + rb), (pad, wp + cb - w - pad))
    )
    if hpad or wpad:
        zs = ((0, 0), (0, hpad), (0, wpad))
        fx = jnp.pad(fx, zs)
        fy = jnp.pad(fy, zs)
        R0 = jnp.pad(R0, ((0, 0), (0, 0), (0, hpad), (0, wpad)))
    grid = (n, hp // rb, wp // cb)

    field_spec = pl.BlockSpec(
        (1, rb, cb), lambda i, r, s: (i, r, s), memory_space=pltpu.VMEM
    )
    r0_spec = pl.BlockSpec(
        (1, 5, rb, cb), lambda i, r, s: (i, 0, r, s), memory_space=pltpu.VMEM
    )
    r1_views = [
        pl.BlockSpec((1, 5, rb, cb), lambda i, r, s: (i, 0, r, s), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 5, rb, cb), lambda i, r, s: (i, 0, r + 1, s), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 5, rb, cb), lambda i, r, s: (i, 0, r, s + 1), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 5, rb, cb), lambda i, r, s: (i, 0, r + 1, s + 1), memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, band, rb, cb, h, w),
        out_shape=jax.ShapeDtypeStruct((n, 5, hp, wp), out_dtype),
        grid=grid,
        in_specs=[r0_spec] + r1_views + [field_spec] * 2,
        out_specs=r0_spec,
        scratch_shapes=[
            pltpu.VMEM((5, 2 * rb, 2 * cb), jnp.float32),
            pltpu.VMEM((5, rb, cb), jnp.float32),
            pltpu.VMEM((5, rb, cb), jnp.float32),
        ],
        # independent grid steps (scratch fully rewritten per step)
        compiler_params=compiler_params("parallel", "parallel", "parallel"),
        interpret=interpret,
    )(R0, R1p, R1p, R1p, R1p, fx, fy)
    return out[:, :, :h, :w]


def _kernel(
    band, rb, cb, h, w, r0_ref, r1a_ref, r1b_ref, r1c_ref, r1d_ref,
    fx_ref, fy_ref, out_ref, slab_ref, acc_ref, cd_ref,
):
    pad = band + 1
    r0 = r0_ref[0].astype(jnp.float32)  # (5, rb, cb); f32 compute for bf16 storage
    # stage the four neighbour block views into one VMEM slab so the row loop
    # below can take dynamic rotates of it (Mosaic has no dynamic_slice on
    # values, only on refs, and unaligned static sublane windows of a ref
    # lower as slow copies — measured 3x worse than the rotate on v5e); the
    # store converts bf16 loads to the f32 scratch
    slab_ref[:, :rb, :cb] = r1a_ref[0].astype(jnp.float32)
    slab_ref[:, rb:, :cb] = r1b_ref[0].astype(jnp.float32)
    slab_ref[:, :rb, cb:] = r1c_ref[0].astype(jnp.float32)
    slab_ref[:, rb:, cb:] = r1d_ref[0].astype(jnp.float32)
    fx = fx_ref[0]
    fy = fy_ref[0]
    dxi = jnp.floor(fx).astype(jnp.int32)
    dyi = jnp.floor(fy).astype(jnp.int32)
    tx = fx - dxi.astype(jnp.float32)
    ty = fy - dyi.astype(jnp.float32)

    # The bilinear accumulation is a (2band+1)² select-FMA sweep, but each
    # pixel touches only a 2x2 stencil, and flows are spatially smooth: the
    # integer displacements in one row block typically span 2-3 values, not
    # 2band+1.  The row loop runs with DYNAMIC fori bounds (the block's
    # [min, max] row-displacement range) over dynamic sublane rotates of the
    # staged slab; the unrolled column offsets are gated by SCALAR range
    # compares (@pl.when) — computing a weight plane + any-reduction per
    # absent offset cost ~45 full-block VPU passes.  Worst-case spread
    # degrades to the full static sweep.  Alternatives measured SLOWER on
    # v5e: rb=32 (+18%), static-unrolled rows reading unaligned ref windows
    # (3x).  Dynamic lane rotates for the columns miscompile past one
    # 128-lane tile (hence static lane slices).
    slab = slab_ref[...]

    # clamp to the band: out-of-band displacements belong to fully-outside
    # pixels whose sampled value the combine masks out (inb False), so
    # skipping them is exact
    dy_lo = jnp.maximum(jnp.min(dyi), -band)
    dy_hi = jnp.minimum(jnp.max(dyi), band - 1)
    dx_lo = jnp.maximum(jnp.min(dxi), -band)
    dx_hi = jnp.minimum(jnp.max(dxi), band - 1)

    acc_ref[...] = jnp.zeros((5, rb, cb), jnp.float32)

    def row_term(k, carry):
        d = k - band
        wy = jnp.where(dyi == d, 1.0 - ty, jnp.where(dyi == d - 1, ty, 0.0))
        # rows[i] = slab[pad + d + i]; the rotate never wraps useful rows
        # because pad + d + rb <= 2*rb for rb >= 2*band + 1
        rolled = pltpu.roll(slab, -d, 1)
        rows = jax.lax.slice_in_dim(rolled, pad, pad + rb, axis=1)
        cd_ref[...] = jnp.zeros((5, rb, cb), jnp.float32)

        for e in range(-band, band + 1):
            @pl.when((e >= dx_lo) & (e <= dx_hi + 1))
            def _col(e=e, rows=rows):
                wx = jnp.where(dxi == e, 1.0 - tx, jnp.where(dxi == e - 1, tx, 0.0))
                seg = jax.lax.slice_in_dim(rows, pad + e, pad + e + cb, axis=2)
                cd_ref[...] += wx[None] * seg

        acc_ref[...] += wy[None] * cd_ref[...]
        return carry

    jax.lax.fori_loop(dy_lo + band, dy_hi + band + 2, row_term, 0)
    acc = acc_ref[...]

    # ---- combine into the normal equations (mirrors _combine_matrices_cf) ----
    row0 = pl.program_id(1) * rb
    col0 = pl.program_id(2) * cb
    iy = row0 + jax.lax.broadcasted_iota(jnp.int32, (rb, cb), 0)
    ix = col0 + jax.lax.broadcasted_iota(jnp.int32, (rb, cb), 1)
    ax = ix + dxi
    ay = iy + dyi
    inb = (ax >= 0) & (ax < w - 1) & (ay >= 0) & (ay < h - 1)
    dx = fx
    dy = fy

    r2 = jnp.where(inb, acc[0], 0.0)
    r3 = jnp.where(inb, acc[1], 0.0)
    r4 = jnp.where(inb, (r0[2] + acc[2]) * 0.5, r0[2])
    r5 = jnp.where(inb, (r0[3] + acc[3]) * 0.5, r0[3])
    r6 = jnp.where(inb, (r0[4] + acc[4]) * 0.25, r0[4] * 0.5)
    r2 = (r0[0] - r2) * 0.5
    r3 = (r0[1] - r3) * 0.5
    r2 = r2 + r4 * dy + r6 * dx
    r3 = r3 + r6 * dy + r5 * dx

    scale = _edge_scale(ix, w) * _edge_scale(iy, h)
    r2 = r2 * scale
    r3 = r3 * scale
    r4 = r4 * scale
    r5 = r5 * scale
    r6 = r6 * scale

    out_ref[0] = jnp.stack(
        [
            r4 * r4 + r6 * r6,  # G11 (y-eq)
            (r4 + r5) * r6,     # G12
            r5 * r5 + r6 * r6,  # G22 (x-eq)
            r4 * r2 + r6 * r3,  # h1
            r6 * r2 + r5 * r3,  # h2
        ],
        axis=0,
    ).astype(out_ref.dtype)
