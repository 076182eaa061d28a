"""Input validation (reference: shared_modules/img_checks.py:26-86)."""

from __future__ import annotations

import numpy as np

__all__ = [
    "check_img_is_2d_grey",
    "check_img_is_provided",
    "check_img_dims_match",
]


def check_img_is_2d_grey(img, img_type: str):
    if len(img.shape) > 2:
        raise ValueError(
            f"Expected {img_type} input to be 2D grayscale image, "
            f"but received {img_type} image with shape {img.shape}"
        )


def check_img_is_provided(img, img_type: str):
    if img is None or np.size(img) == 0:
        raise ValueError(f"No {img_type} image provided")


def check_img_dims_match(ref, mov):
    if tuple(ref.shape) != tuple(mov.shape):
        raise ValueError(
            "Input images have different dimensions "
            f"reference image shape: {ref.shape}, moving image shape: {mov.shape}"
        )
