"""Input validation (reference: shared_modules/img_checks.py:26-86)."""

from __future__ import annotations

import numpy as np

__all__ = [
    "check_img_is_2d_grey",
    "check_img_is_provided",
    "check_img_dims_match",
    "check_input_has_proper_dimensions",
    "check_number_of_input_img_paths",
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


def check_input_has_proper_dimensions(img_path):
    """Image must have exactly 4 dimensions, order CZYX
    (reference img_checks.py:50-67)."""
    from microaligner_tpu.io.tiff import TiffFile

    with TiffFile(img_path) as tf:
        shape = tf.series[0].shape
    if len(shape) != 4:
        raise ValueError(
            "Expected image that has precisely 4 dimensions "
            f"but image {str(img_path)} has {len(shape)}, and shape {shape}"
        )


def check_number_of_input_img_paths(img_paths, is_stack: bool):
    """Stacks take exactly one path; otherwise at least two cycles
    (reference img_checks.py:70-86)."""
    if len(img_paths) == 1:
        if not is_stack:
            raise ValueError("You need to provide at least two images to do a registration.")
    elif len(img_paths) > 1:
        if is_stack:
            raise ValueError(
                "Too many input images. "
                "When flag InputIsCycleStack is true only one image can be used"
            )
    else:
        raise ValueError("You need to provide at least two images to do a registration.")
