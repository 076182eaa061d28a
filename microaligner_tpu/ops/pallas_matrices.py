"""Pallas TPU kernel: fused Farneback matrix update.

Each Farneback iteration after the first must bilinearly sample the 5-channel
polynomial expansion R1 at p + flow(p) and combine it with R0 into the
displacement normal equations M (reference compute: the FarnebackUpdateMatrices
stage behind cv.calcOpticalFlowFarneback, driven from optflow_reg/flow_calc.py).
Done as separate XLA ops this costs ~230 ms per iteration at 25x1200^2 tiles —
the banded select-FMA sampling and the elementwise combine each make a full
HBM round trip per channel.  This kernel keeps one row-block of all five
channels of R0/R1 plus the displacement fields resident in VMEM and emits M
directly: one HBM read per input plane, one write per output plane.

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

__all__ = ["pallas_update_matrices"]

_ROW_BLOCK = 16
# OpenCV's border down-weighting of the displacement equations, outer 5 px
# (must match optflow/farneback.py::_BORDER_SCALE).
_BORDER = 5


def _edge_scale(i, size):
    lead = jnp.where(i < _BORDER, jnp.where(i <= 1, 0.14, 0.4472), 1.0)
    ti = size - 1 - i
    trail = jnp.where(ti < _BORDER, jnp.where(ti <= 1, 0.14, 0.4472), 1.0)
    return lead * trail


@functools.partial(jax.jit, static_argnames=("band", "interpret"))
def pallas_update_matrices(
    R0: jax.Array,
    R1: jax.Array,
    dxi: jax.Array,
    dyi: jax.Array,
    tx: jax.Array,
    ty: jax.Array,
    band: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """Fused banded-sample + matrix combine.

    ``R0``/``R1`` are (N, 5, H, W) float32 polynomial expansions; ``dxi``/
    ``dyi`` (N, H, W) int32 integer displacement parts, ``tx``/``ty`` their
    fractional parts.  Returns M = (N, 5, H, W) channels [G11,G12,G22,h1,h2].
    Requires H >= 2*band + 1 (callers gate on this).
    """
    n, c, h, w = R0.shape
    assert c == 5
    pad = band + 1
    # the row block must cover the band's roll range; round to sublanes
    rb = max(_ROW_BLOCK, -(-(2 * band + 1) // 8) * 8)
    rb = min(rb, h)
    if rb < 2 * band + 1:
        raise ValueError(f"pallas_update_matrices needs H >= {2 * band + 1}, got {h}")
    hpad = (-h) % rb
    # rows: `pad` halo on top, `pad + hpad + rb` below so the (r+1) row-block
    # view stays in bounds for the last output block.  Lanes: `pad` halo left,
    # right halo rounded so the slab lane count is 128-aligned — the dynamic
    # lane rotate in the kernel requires an aligned shape.
    wal = -(-(w + 2 * pad) // 128) * 128
    R1p = jnp.pad(R1, ((0, 0), (0, 0), (pad, pad + hpad + rb), (pad, wal - w - pad)))
    if hpad:
        zs = ((0, 0), (0, hpad), (0, 0))
        dxi = jnp.pad(dxi, zs)
        dyi = jnp.pad(dyi, zs)
        tx = jnp.pad(tx, zs)
        ty = jnp.pad(ty, zs)
        R0 = jnp.pad(R0, ((0, 0), (0, 0), (0, hpad), (0, 0)))
    hp = h + hpad
    grid = (n, hp // rb)

    field_spec = pl.BlockSpec((1, rb, w), lambda i, r: (i, r, 0), memory_space=pltpu.VMEM)
    r0_spec = pl.BlockSpec((1, 5, rb, w), lambda i, r: (i, 0, r, 0), memory_space=pltpu.VMEM)
    # R1 passed twice with consecutive row-block views; their concat covers the
    # rb + 2*pad rows each output block needs (overlapping windows aren't
    # expressible with one BlockSpec)
    r1_spec_a = pl.BlockSpec(
        (1, 5, rb, wal), lambda i, r: (i, 0, r, 0), memory_space=pltpu.VMEM
    )
    r1_spec_b = pl.BlockSpec(
        (1, 5, rb, wal), lambda i, r: (i, 0, r + 1, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel, band, rb, h, w),
        out_shape=jax.ShapeDtypeStruct((n, 5, hp, w), jnp.float32),
        grid=grid,
        in_specs=[r0_spec, r1_spec_a, r1_spec_b] + [field_spec] * 4,
        out_specs=r0_spec,
        scratch_shapes=[
            pltpu.VMEM((5, 2 * rb, wal), jnp.float32),
            pltpu.VMEM((5, rb, w), jnp.float32),
            pltpu.VMEM((5, rb, w), jnp.float32),
        ],
        interpret=interpret,
    )(R0, R1p, R1p, dxi, dyi, tx, ty)
    return out[:, :, :h, :]


def _kernel(
    band, rb, h, w, r0_ref, r1a_ref, r1b_ref, dxi_ref, dyi_ref, tx_ref, ty_ref,
    out_ref, slab_ref, acc_ref, cd_ref,
):
    pad = band + 1
    r0 = r0_ref[0]  # (5, rb, w)
    # stage the two consecutive row-block views into one VMEM slab so the
    # row loop below can take dynamic-start reads from it (Mosaic has no
    # dynamic_slice on values, only on refs)
    slab_ref[:, :rb, :] = r1a_ref[0]
    slab_ref[:, rb:, :] = r1b_ref[0]
    dxi = dxi_ref[0]
    dyi = dyi_ref[0]
    tx = tx_ref[0]
    ty = ty_ref[0]

    # The bilinear accumulation is a (2band+1)² select-FMA sweep, but each
    # pixel touches only a 2x2 stencil, and flows are spatially smooth: the
    # integer displacements in one row block typically span 2-3 values, not
    # 2band+1.  Both offset loops therefore run with DYNAMIC bounds — the
    # block's [min, max] displacement range — skipping offsets nobody uses
    # (exactly zero weight), which cuts the roll+select work ~9x for typical
    # sub-pixel per-level flows.  Worst-case spread degrades to the full
    # static sweep.  Loops stay fori_loops (not unrolled): Mosaic's scoped
    # stack allocation keeps every unrolled iteration's slices live, which
    # blows the 16 MB VMEM budget.  The loop-varying row window comes from a
    # dynamic sublane rotate + static slice (unaligned dynamic-start vector
    # loads aren't lowerable); the column window from a dynamic lane rotate.
    slab = slab_ref[...]

    # clamp to the band: out-of-band displacements belong to fully-outside
    # pixels whose sampled value the combine masks out (inb False), so
    # skipping them is exact
    dy_lo = jnp.maximum(jnp.min(dyi), -band)
    dy_hi = jnp.minimum(jnp.max(dyi), band - 1)

    # a single outlier pixel in the block stretches [d_lo, d_hi] to the full
    # band; most d (and e) values in that range have all-zero weights, so the
    # expensive rolls are skipped at runtime (@pl.when predicated regions
    # accumulating into VMEM scratch — value-carried lax.cond miscompiles
    # under Mosaic's nested-region lowering)
    acc_ref[...] = jnp.zeros((5, rb, w), jnp.float32)

    def row_term(k, carry):
        d = k - band
        wy = jnp.where(dyi == d, 1.0 - ty, jnp.where(dyi == d - 1, ty, 0.0))

        @pl.when(jnp.any(wy > 0.0))
        def _row():
            # rows[i] = slab[pad + d + i]; the rotate never wraps useful rows
            # because pad + d + rb <= 2*rb for rb >= 2*band + 1
            rolled = pltpu.roll(slab, -d, 1)
            rows = jax.lax.slice_in_dim(rolled, pad, pad + rb, axis=1)
            cd_ref[...] = jnp.zeros((5, rb, w), jnp.float32)

            # the column loop unrolls with STATIC lane slices: dynamic lane
            # rotates miscompile under Mosaic when the lane extent spans more
            # than one 128-tile (verified on v5e — sublane rotates are fine);
            # absent offsets still skip their FMA at runtime via pl.when
            for e in range(-band, band + 1):
                wx = jnp.where(dxi == e, 1.0 - tx, jnp.where(dxi == e - 1, tx, 0.0))

                @pl.when(jnp.any(wx > 0.0))
                def _col(e=e, wx=wx):
                    seg = jax.lax.slice_in_dim(rows, pad + e, pad + e + w, axis=2)
                    cd_ref[...] += wx[None] * seg

            acc_ref[...] += wy[None] * cd_ref[...]

        return carry

    jax.lax.fori_loop(dy_lo + band, dy_hi + band + 2, row_term, 0)
    acc = acc_ref[...]

    # ---- combine into the normal equations (mirrors _combine_matrices_cf) ----
    row0 = pl.program_id(1) * rb
    iy = row0 + jax.lax.broadcasted_iota(jnp.int32, (rb, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (rb, w), 1)
    ax = ix + dxi
    ay = iy + dyi
    inb = (ax >= 0) & (ax < w - 1) & (ay >= 0) & (ay < h - 1)
    dx = dxi.astype(jnp.float32) + tx
    dy = dyi.astype(jnp.float32) + ty

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
    )
