"""Linear/affine registration: FAST -> DAISY -> exact knn -> RANSAC on TPU.

Re-design of the reference feature engine (microaligner/feature_reg/):
sparse, data-dependent keypoint lists become fixed-capacity masked arrays;
FLANN's approximate KD-tree knn becomes an exact top-2 over an MXU distance
matrix; OpenCV's sequential RANSAC becomes a batch of vmapped hypotheses.
"""

from microaligner_tpu.features.registrator import FeatureRegistrator
from microaligner_tpu.features.tile_features import (
    Features,
    find_features,
    match_features,
    register_img_pair,
)

__all__ = [
    "FeatureRegistrator",
    "Features",
    "find_features",
    "register_img_pair",
    "match_features",
]
