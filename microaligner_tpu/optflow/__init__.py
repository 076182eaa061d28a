"""Non-linear registration: tiled pyramidal Farneback optical flow on TPU.

Re-design of the reference optflow engine (microaligner/optflow_reg/) —
the dask per-tile process pool becomes a vmapped/sharded tile axis, and
``cv.calcOpticalFlowFarneback`` becomes a faithful XLA reconstruction of the
Farneback algorithm (polynomial expansion -> displacement normal equations ->
Gaussian aggregation -> iterative refinement).
"""

from microaligner_tpu.optflow.farneback import farneback
from microaligner_tpu.optflow.flow_calc import TileFlowCalc
from microaligner_tpu.optflow.registrator import OptFlowRegistrator
from microaligner_tpu.optflow.warper import Warper

__all__ = ["farneback", "TileFlowCalc", "OptFlowRegistrator", "Warper"]
