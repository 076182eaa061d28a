"""Shared TPU image ops (pure XLA): filters, pyramids, warps, histograms.

Replaces the reference's OpenCV/skimage/sklearn native layer
(/root/reference SURVEY §2.10-bis) with JAX primitives that XLA fuses and
tiles onto the TPU's MXU/VPU.
"""

from microaligner_tpu.ops.filters import (
    dog,
    gaussian_blur,
    gaussian_kernel,
    minmax_normalize_f32,
    minmax_normalize_u8,
    pyr_down,
    pyr_up,
)
from microaligner_tpu.ops.pad import pad_to_shape
from microaligner_tpu.ops.warp import (
    affine_warp,
    bilinear_remap,
    compose_flows,
    transform_img_with_tmat,
    warp_with_flow,
)
from microaligner_tpu.ops.mutual_info import nmi_u8, mi_tiled, check_if_higher_similarity

__all__ = [
    "dog",
    "gaussian_blur",
    "gaussian_kernel",
    "minmax_normalize_f32",
    "minmax_normalize_u8",
    "pyr_down",
    "pyr_up",
    "pad_to_shape",
    "affine_warp",
    "bilinear_remap",
    "compose_flows",
    "transform_img_with_tmat",
    "warp_with_flow",
    "nmi_u8",
    "mi_tiled",
    "check_if_higher_similarity",
]
