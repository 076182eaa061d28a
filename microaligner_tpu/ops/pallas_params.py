"""Shared Mosaic compiler-parameter plumbing for the Pallas kernels.

Two knobs matter for these grid-step-overhead-bound kernels:

* ``dimension_semantics`` — declaring grid dims "parallel" lets Mosaic
  pipeline/reorder steps; ring-buffer axes stay "arbitrary" (sequential).
* ``vmem_limit_bytes`` — the Mosaic default scoped-VMEM budget (~16 MB)
  caps block sizes well below the chip's physical VMEM (128 MB on v5e);
  raising it admits wider lane blocks, i.e. fewer grid steps.
  ``MICROALIGNER_TPU_VMEM_LIMIT_MB`` overrides (trace-time; sweeps use it
  via scripts/probe_block_sizes.py before a value is baked in here).
"""

from __future__ import annotations

import os

from jax.experimental.pallas import tpu as pltpu

__all__ = ["compiler_params", "vmem_budget_bytes"]

# Default raised scoped-VMEM budget in MB; None keeps Mosaic's default.
_DEFAULT_VMEM_MB: float | None = None


def _limit_mb() -> float | None:
    mb = os.environ.get("MICROALIGNER_TPU_VMEM_LIMIT_MB")
    if mb:
        return float(mb)
    return _DEFAULT_VMEM_MB


def vmem_budget_bytes(default_mb: float | None = None) -> int:
    """Approximate per-step VMEM budget kernels may size blocks against:
    3/4 of the scoped limit (leaves room beyond the double-buffered blocks
    the sizing already counts).  ``default_mb`` is the kernel's own raised
    limit (the one it passes to ``compiler_params``); the env var overrides
    both."""
    mb = _limit_mb() or default_mb or 16.0
    return int(mb * 2**20 * 0.75)


def compiler_params(
    *dimension_semantics: str, vmem_mb: float | None = None
) -> pltpu.CompilerParams:
    """CompilerParams with the given grid-dim semantics and the repo's
    scoped-VMEM budget (per-kernel ``vmem_mb`` default, env override wins)."""
    kw = {"dimension_semantics": tuple(dimension_semantics)}
    mb = _limit_mb() or vmem_mb
    if mb is not None:
        kw["vmem_limit_bytes"] = int(mb * 2**20)
    return pltpu.CompilerParams(**kw)
