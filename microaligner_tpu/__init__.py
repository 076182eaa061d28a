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

import os as _os


def _enable_compile_cache():
    """Point jax at a persistent compilation cache unless the user already
    configured one.

    The fused registration programs take 1-3 minutes of XLA compile on a cold
    process; with the cache, every process after the first starts warm.  Set
    ``MICROALIGNER_TPU_COMPILE_CACHE=0`` to disable, or to a directory to
    relocate (default ``~/.cache/microaligner_tpu/jax``).  A user-set
    ``JAX_COMPILATION_CACHE_DIR`` / ``jax.config`` value always wins.
    """
    want = _os.environ.get("MICROALIGNER_TPU_COMPILE_CACHE", "")
    if want == "0":
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir or _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR"
        ):
            return  # user already configured a cache
        path = want or _os.path.join(
            _os.path.expanduser("~"), ".cache", "microaligner_tpu", "jax"
        )
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # cache is an optimization; never block import


_enable_compile_cache()

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
