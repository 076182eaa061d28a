"""Centered constant padding to a target shape.

Mirrors the reference ``pad_to_shape`` / ``_calculate_padding_size``
(shared_modules/utils.py:39-66): the odd remainder goes to the right/bottom,
except a difference of exactly 1 which also goes to the right/bottom.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["calculate_padding_size", "pad_to_shape"]


def calculate_padding_size(bigger: int, smaller: int) -> Tuple[int, int]:
    diff = bigger - smaller
    if diff == 1:
        return 0, 1
    if diff % 2 != 0:
        return diff // 2, diff // 2 + 1
    return diff // 2, diff // 2


def pad_to_shape(img, target_shape: Tuple[int, int]):
    """Pad a 2-D image with zeros to ``target_shape``.

    Returns ``(padded_img, (left, right, top, bottom))`` exactly like the
    reference (shared_modules/utils.py:53-66).  Works on numpy or JAX arrays;
    the pad itself is a cheap host/XLA ``pad`` op.
    """
    if tuple(img.shape) == tuple(target_shape):
        return img, (0, 0, 0, 0)
    left, right = calculate_padding_size(target_shape[1], img.shape[1])
    top, bottom = calculate_padding_size(target_shape[0], img.shape[0])
    xp = np if isinstance(img, np.ndarray) else jnp
    padded = xp.pad(img, ((top, bottom), (left, right)), mode="constant")
    return padded, (left, right, top, bottom)
