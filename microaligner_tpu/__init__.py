"""microaligner_tpu — TPU-native image registration for large-scale microscopy.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
VasylVaskivskyi/microaligner (reference: /root/reference/microaligner/__init__.py:18-20):

* ``FeatureRegistrator``  — linear/affine registration (FAST -> DAISY -> knn -> RANSAC)
* ``OptFlowRegistrator``  — non-linear registration (tiled pyramidal Farneback flow)
* ``Warper``              — tiled flow-field warping
* ``pad_to_shape``        — centered constant padding
* ``transform_img_with_tmat`` — pad + affine warp preserving dtype

All dense compute runs on TPU through XLA; tile-level parallelism maps onto a
``jax.sharding.Mesh`` instead of the reference's dask process pool.
"""

from microaligner_tpu.ops.pad import pad_to_shape
from microaligner_tpu.ops.warp import transform_img_with_tmat

__version__ = "0.1.0"


def __getattr__(name):  # lazy: avoid importing both engines for ops-only users
    if name == "FeatureRegistrator":
        from microaligner_tpu.features.registrator import FeatureRegistrator

        return FeatureRegistrator
    if name == "OptFlowRegistrator":
        from microaligner_tpu.optflow.registrator import OptFlowRegistrator

        return OptFlowRegistrator
    if name == "Warper":
        from microaligner_tpu.optflow.warper import Warper

        return Warper
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

__all__ = [
    "FeatureRegistrator",
    "OptFlowRegistrator",
    "Warper",
    "pad_to_shape",
    "transform_img_with_tmat",
]
