"""Page reading + z-max-projection (reference shared_modules/utils.py:69-95)."""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import jax
import numpy as np

from microaligner_tpu.io.tiff import read_tiff_page
from microaligner_tpu.ops.filters import minmax_normalize_u8

__all__ = ["read_and_max_project_pages"]


def read_and_max_project_pages(
    img_paths: Dict[int, Path], tiff_pages: Dict[int, int]
) -> np.ndarray:
    """Z-maximum-projection of the given pages, min-max normalized to u8.

    Registration always runs on these u8 projections; the final warp is
    applied to original-dtype planes (reference behavior, utils.py:75-95).
    """
    zs = list(img_paths.keys())
    max_proj = read_tiff_page(img_paths[zs[0]], tiff_pages[zs[0]])
    for z in zs[1:]:
        max_proj = np.maximum(max_proj, read_tiff_page(img_paths[z], tiff_pages[z]))
    return np.asarray(jax.device_get(minmax_normalize_u8(max_proj)))
