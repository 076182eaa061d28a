"""OptFlowRegistrator — multi-scale tiled Farneback registration.

Faithful re-design of the reference pyramid driver
(optflow_reg/optflow_registrator.py:51-247): coarse-to-fine Gaussian pyramid,
per-level tiled flow with DoG preprocessing, an NMI gate that accepts or
rejects each level's flow, tile-wise flow composition and pyrUp upscaling.

The accept/reject decisions are host-side scalars between device calls (cheap,
and keeps the device graphs static); all dense math runs on TPU.

Behavioral notes (SURVEY §7 "quirks"):
* ``mov_img`` getter returning the ref image in the reference
  (optflow_registrator.py:73-75) is a latent bug — fixed here: the getter
  returns the moving image.
* the reference upscales a rejected mid-level flow with ``pyrUp(m_flow*4)``
  (optflow_registrator.py:169) where every other path uses ``*2``; this is a
  probable bug, only reachable when the MI gate rejects a middle pyramid
  level.  We default to the corrected ``*2`` and expose
  ``replicate_reject_upscale_bug=True`` for bit-compat runs.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from microaligner_tpu.utils.logging import log, stage_timer

from microaligner_tpu.ops.filters import dog as _dog
from microaligner_tpu.ops.filters import pyr_down, pyr_up
from microaligner_tpu.ops.mutual_info import check_if_higher_similarity
from microaligner_tpu.ops.warp import compose_flows, compose_flows_batched
from microaligner_tpu.optflow.flow_calc import TileFlowCalc
from microaligner_tpu.optflow.warper import Warper, warp_tiled_dtype
from microaligner_tpu.tiles import TileGrid, split_into_tiles, stitch_tiles
from microaligner_tpu.utils.img_checks import (
    check_img_dims_match,
    check_img_is_2d_grey,
    check_img_is_provided,
)

__all__ = ["OptFlowRegistrator", "merge_two_flows"]


def _profile_sync(x):
    """Force a device sync so per-stage timers are attributable (profiling
    only; block_until_ready is not reliable over the tunneled backend, so a
    scalar fetch is used)."""
    from microaligner_tpu.utils.logging import profiling_enabled

    if profiling_enabled():
        float(jnp.sum(jnp.asarray(x).astype(jnp.float32).ravel()[:1]))


def merge_two_flows(flow1: np.ndarray, flow2: np.ndarray) -> np.ndarray:
    """Compose flow fields (optflow_registrator.py:37-47)."""
    return np.asarray(jax.device_get(compose_flows(jnp.asarray(flow1), jnp.asarray(flow2))))


def _dog_traced(img, use_it: bool):
    """dog() usable under an outer trace (no host zero-check round trip)."""
    from microaligner_tpu.ops.filters import dog_traced

    return dog_traced(img, use_it)


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid", "win_size", "num_iter", "use_dog", "tile_size",
        "pre_warp", "whole_image", "dtype_name",
    ),
)
def _fused_level(
    ref_lvl, mov_lvl, m_flow,
    grid, win_size, num_iter, use_dog, tile_size,
    pre_warp, whole_image, dtype_name,
):
    """One pyramid level as ONE device program: optional pre-warp by the
    accumulated flow, DoG, tiled (or whole-image) Farneback, post-warp, and
    both NMI gate scores.  The host reads back just two scalars per level —
    a dozen separate launches otherwise, each costing 25-70 ms over the dev
    tunnel (and preventing cross-stage overlap on any hardware).
    """
    from microaligner_tpu.ops.mutual_info import mi_tiled_traced
    from microaligner_tpu.optflow.farneback import _farneback_core_batched
    from microaligner_tpu.optflow.flow_calc import calc_flow_and_warp_tiled

    mov_this = mov_lvl
    if pre_warp:
        mov_this = warp_tiled_dtype(mov_lvl, m_flow, grid, dtype_name)

    ref_dog = _dog_traced(ref_lvl, use_dog)
    mov_dog = _dog_traced(mov_this, use_dog)
    if whole_image:
        this_flow = _farneback_core_batched(
            jnp.asarray(mov_dog, jnp.float32)[None],
            jnp.asarray(ref_dog, jnp.float32)[None],
            win_size, num_iter, 1, 1.7,
        )[0]
        mov_warped = warp_tiled_dtype(mov_this, this_flow, grid, dtype_name)
    else:
        # flow + post-warp fused per tile chunk: the separate warp pass
        # re-read the stitched flow and the mov canvas (3.3 GB + 0.4 GB of
        # HBM round trips at 20k x 20k)
        this_flow, mov_warped = calc_flow_and_warp_tiled(
            ref_dog, mov_dog, mov_this, grid, win_size, num_iter, dtype_name
        )

    gate_ref = _dog_traced(ref_lvl, True)
    mi_after = mi_tiled_traced(gate_ref, _dog_traced(mov_warped, True), tile_size)
    mi_before = mi_tiled_traced(gate_ref, _dog_traced(mov_lvl, True), tile_size)
    return this_flow, mi_after, mi_before


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid", "win_size", "num_iter", "use_dog", "tile_size",
        "pre_warp", "whole_image", "dtype_name",
        "is_first", "is_last", "next_shape", "full_shape",
        "use_full_res", "reject_mult",
    ),
)
def _fused_level_carry(
    ref_lvl, mov_lvl, m_flow,
    grid, win_size, num_iter, use_dog, tile_size,
    pre_warp, whole_image, dtype_name,
    is_first, is_last, next_shape, full_shape, use_full_res, reject_mult,
):
    """One pyramid level INCLUDING the accept/reject carry, as one program.

    Extends ``_fused_level`` with the reference's post-gate bookkeeping
    (optflow_registrator.py:134-169): flow composition, the per-branch pyrUp
    upscales, and the zero-flow reject at the coarsest level.  The composition
    and a single pyrUp run unconditionally and ``jnp.where`` selects between
    the accept/reject inputs, so the accumulated flow never visits the host —
    ``register()`` becomes one launch per level plus one final fetch instead
    of 3-5 launches and two scalar syncs per level.

    Returns ``(m_flow_next, mi_after, mi_before)``.
    """
    this_flow, mi_after, mi_before = _fused_level(
        ref_lvl, mov_lvl, m_flow,
        grid, win_size, num_iter, use_dog, tile_size,
        pre_warp, whole_image, dtype_name,
    )
    accept = mi_after > mi_before

    from microaligner_tpu.optflow.warper import compose_flows_tiled

    if is_first:
        target = full_shape if is_last else next_shape
        if is_last and abs(this_flow.shape[0] - full_shape[0]) <= 1:
            # single-level pyramid at (almost) full size: accept keeps the raw
            # flow (the reference's upscale chain is a no-op there)
            m_next = jnp.where(accept, this_flow, jnp.zeros_like(this_flow))
        else:
            mult = 2.0 if not is_last else 1.0
            up = pyr_up(this_flow * mult, (int(target[0]), int(target[1])))
            m_next = jnp.where(accept, up, jnp.zeros_like(up))
        return m_next, mi_after, mi_before

    merged = compose_flows_tiled(m_flow, this_flow, grid)
    if is_last:
        if use_full_res:
            return jnp.where(accept, merged, m_flow), mi_after, mi_before
        if abs(merged.shape[0] - full_shape[0]) <= 1:
            return jnp.where(accept, merged, m_flow), mi_after, mi_before
        # accept: one pyrUp of the merged flow to full res, values unscaled
        # (the reference's _upscale_flow_to_full_res quirk); reject: the
        # doubled accumulated flow upscaled (optflow_registrator.py:163-168)
        src = jnp.where(accept, merged, m_flow * 2.0)
        return (
            pyr_up(src, (int(full_shape[0]), int(full_shape[1]))),
            mi_after, mi_before,
        )
    src = jnp.where(accept, merged * 2.0, m_flow * float(reject_mult))
    return (
        pyr_up(src, (int(next_shape[0]), int(next_shape[1]))),
        mi_after, mi_before,
    )


def _build_pyramid(arr, num_pyr_lvl: int, use_full_res: bool):
    """Smallest-first Gaussian pyramid, traceable under an outer jit (every
    decision depends only on static shapes; optflow_registrator.py:175-202)."""
    pyramid: List = []
    factors: List[int] = []
    pyr_lvl = jnp.asarray(arr)
    for lvl in range(num_pyr_lvl):
        factor = 2 ** (lvl + 1)
        if arr.shape[0] / factor < 100 or arr.shape[1] / factor < 100:
            break
        pyr_lvl = pyr_down(pyr_lvl)
        pyramid.append(pyr_lvl)
        factors.append(factor)
    factors = list(reversed(factors))
    pyramid = list(reversed(pyramid))
    if use_full_res:
        pyramid.append(jnp.asarray(arr))
        factors.append(1)
    return pyramid, factors


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_pyr_lvl", "use_full_res", "tile_size", "overlap",
        "win_size", "num_iter", "use_dog", "dtype_name", "reject_mult",
    ),
)
def _register_whole(
    ref_img, mov_img,
    num_pyr_lvl, use_full_res, tile_size, overlap,
    win_size, num_iter, use_dog, dtype_name, reject_mult,
):
    """The ENTIRE multi-level registration as ONE device program: both
    pyramids, every level's pre-warp/DoG/Farneback/gate, the on-device
    accept/reject carry, composition, and the final upscale.  The host sees
    a single launch and one batched scalar fetch (the per-level MI scores
    for logging) — mirrors the feature engine's ``_register_fused``.  The
    per-level path (``MICROALIGNER_TPU_WHOLE_REGISTER=0``) is kept for
    stage-level profiling and A/B timing.
    """
    ref_pyr, factors = _build_pyramid(ref_img, num_pyr_lvl, use_full_res)
    mov_pyr, _ = _build_pyramid(mov_img, num_pyr_lvl, use_full_res)

    num_lvl = len(factors)
    full_shape = tuple(int(s) for s in mov_img.shape)
    m_flow = jnp.zeros((1, 1, 2), jnp.float32)  # dummy until level 0 runs
    scores = []
    for lvl in range(num_lvl):
        shape = tuple(int(s) for s in mov_pyr[lvl].shape)
        grid = TileGrid.for_image(shape, tile_size, overlap)
        is_first = lvl == 0
        is_last = lvl == num_lvl - 1
        next_shape = (
            full_shape if is_last
            else tuple(int(s) for s in mov_pyr[lvl + 1].shape)
        )
        m_flow, mi_after, mi_before = _fused_level_carry(
            ref_pyr[lvl], mov_pyr[lvl], m_flow,
            grid, win_size, num_iter, use_dog,
            tile_size, not is_first, max(shape) / tile_size < 2,
            dtype_name,
            is_first, is_last, next_shape, full_shape,
            use_full_res, reject_mult,
        )
        scores.append((mi_after, mi_before))
    return m_flow, scores


class OptFlowRegistrator:
    def __init__(self):
        self._ref_img = np.array([])
        self._mov_img = np.array([])
        self.num_pyr_lvl = 4
        self.num_iterations = 3
        self.tile_size = 1000
        self.overlap = 100
        self.use_full_res_img = False
        self.use_dog = False
        self.replicate_reject_upscale_bug = False
        self._warper = Warper()
        self._tile_flow_calc = TileFlowCalc()

    @property
    def ref_img(self) -> np.ndarray:
        return self._ref_img

    @ref_img.setter
    def ref_img(self, img: np.ndarray):
        check_img_is_2d_grey(img, "ref")
        self._ref_img = img

    @property
    def mov_img(self) -> np.ndarray:
        return self._mov_img  # reference returns _ref_img here (bug); fixed

    @mov_img.setter
    def mov_img(self, img: np.ndarray):
        check_img_is_2d_grey(img, "mov")
        self._mov_img = img

    def _init_components(self):
        self._warper = Warper()
        self._warper.tile_size = self.tile_size
        self._warper.overlap = self.overlap
        self._tile_flow_calc = TileFlowCalc()
        self._tile_flow_calc.tile_size = self.tile_size
        self._tile_flow_calc.overlap = self.overlap
        self._tile_flow_calc.num_iter = self.num_iterations
        # winsize tied to the halo width (optflow_registrator.py:91)
        self._tile_flow_calc.win_size = self.overlap - (1 - self.overlap % 2)

    def register(self) -> np.ndarray:
        """Returns the full-resolution (H, W, 2) flow aligning mov to ref.

        Host-array API matching the reference (optflow_registrator.py:93).
        Downstream device-side consumers (the pipeline's warp/apply stages)
        should prefer :meth:`register_device`, which skips the full-flow
        fetch — 3.2 GB of f32 at 20k x 20k.
        """
        return np.asarray(jax.device_get(self.register_device()))

    def register_device(self) -> jax.Array:
        """:meth:`register` but the flow stays on device.

        The accumulated flow is carried on device through the whole level
        loop (``_fused_level_carry``): one launch per pyramid level, and the
        MI gate scalars are read back in a single batch at the end for
        logging — essential at 20k x 20k where a single full-res f32 flow is
        3.2 GB, and on any backend where launches cost more than
        microseconds.  ``MICROALIGNER_TPU_CARRY_LEVEL=0`` restores the
        host-driven accept/reject loop.
        """
        import os

        check_img_is_provided(self._ref_img, "ref")
        check_img_is_provided(self._mov_img, "mov")
        check_img_dims_match(self._ref_img, self._mov_img)
        if os.environ.get("MICROALIGNER_TPU_CARRY_LEVEL", "1") == "0":
            return jnp.asarray(self._register_stepwise())
        if os.environ.get("MICROALIGNER_TPU_WHOLE_REGISTER", "1") == "1":
            return self._register_whole_launch()

        self._init_components()
        win_size = self.overlap - (1 - self.overlap % 2)
        ref_pyr, factors = self._generate_img_pyr(jnp.asarray(self._ref_img))
        mov_pyr, _ = self._generate_img_pyr(jnp.asarray(self._mov_img))
        dtype_name = np.dtype(self._mov_img.dtype).name

        num_lvl = len(factors)
        full_shape = tuple(int(s) for s in self._mov_img.shape)
        m_flow = jnp.zeros((1, 1, 2), jnp.float32)  # dummy until level 0 runs
        scores = []
        for lvl, factor in enumerate(factors):
            shape = tuple(int(s) for s in mov_pyr[lvl].shape)
            grid = TileGrid.for_image(shape, self.tile_size, self.overlap)
            is_first = lvl == 0
            is_last = lvl == num_lvl - 1
            next_shape = (
                full_shape if is_last
                else tuple(int(s) for s in mov_pyr[lvl + 1].shape)
            )
            with stage_timer(f"lvl{factor} fused level+carry"):
                m_flow, mi_after, mi_before = _fused_level_carry(
                    ref_pyr[lvl], mov_pyr[lvl], m_flow,
                    grid, win_size, self.num_iterations, self.use_dog,
                    self.tile_size, not is_first, max(shape) / self.tile_size < 2,
                    dtype_name,
                    is_first, is_last, next_shape, full_shape,
                    self.use_full_res_img,
                    4 if self.replicate_reject_upscale_bug else 2,
                )
                _profile_sync(mi_after)
            scores.append((factor, mi_after, mi_before))

        fetched = jax.device_get([(a, b) for _, a, b in scores])
        for (factor, _, _), (mi_after, mi_before) in zip(scores, fetched):
            log("Pyramid factor", factor)
            log("    MI score after:", float(mi_after), "| MI score before:", float(mi_before))
            log("    Better alignment than before" if mi_after > mi_before
                else "    Worse alignment than before")
        return m_flow

    def _register_whole_launch(self) -> jax.Array:
        """One launch for the whole registration (see ``_register_whole``)."""
        self._init_components()
        win_size = self.overlap - (1 - self.overlap % 2)
        shape = tuple(int(s) for s in self._ref_img.shape)
        # host-side feasibility checks (same errors as _generate_img_pyr,
        # raised before any device work)
        if self.num_pyr_lvl < 0:
            raise ValueError("Number of pyramid levels cannot be less than 0")
        if self.num_pyr_lvl == 0 and not self.use_full_res_img:
            raise ValueError(
                "Number of pyramid levels is 0 and use_full_res_img is False. "
                "Please change one of the parameters"
            )
        factors = [
            2 ** (lvl + 1)
            for lvl in range(self.num_pyr_lvl)
            if shape[0] / 2 ** (lvl + 1) >= 100 and shape[1] / 2 ** (lvl + 1) >= 100
        ]
        factors = list(reversed(factors)) + ([1] if self.use_full_res_img else [])
        if not factors:
            raise ValueError(
                f"Image {shape} is too small for any pyramid level "
                "(min dim 100 px after downscale) and use_full_res_img is "
                "False; enable use_full_res_img or reduce num_pyr_lvl"
            )

        with stage_timer("whole register (1 launch)"):
            m_flow, scores = _register_whole(
                jnp.asarray(self._ref_img), jnp.asarray(self._mov_img),
                self.num_pyr_lvl, self.use_full_res_img,
                self.tile_size, self.overlap,
                win_size, self.num_iterations, self.use_dog,
                np.dtype(self._mov_img.dtype).name,
                4 if self.replicate_reject_upscale_bug else 2,
            )
            _profile_sync(m_flow)
        fetched = jax.device_get(scores)
        for factor, (mi_after, mi_before) in zip(factors, fetched):
            log("Pyramid factor", factor)
            log("    MI score after:", float(mi_after), "| MI score before:", float(mi_before))
            log("    Better alignment than before" if mi_after > mi_before
                else "    Worse alignment than before")
        return m_flow

    def _register_stepwise(self) -> np.ndarray:
        """Host-driven accept/reject loop (pre-carry path; kept for A/B
        timing and as a fallback)."""
        self._init_components()
        win_size = self.overlap - (1 - self.overlap % 2)
        ref_pyr, factors = self._generate_img_pyr(jnp.asarray(self._ref_img))
        mov_pyr, _ = self._generate_img_pyr(jnp.asarray(self._mov_img))
        dtype_name = np.dtype(self._mov_img.dtype).name

        num_lvl = len(factors)
        m_flow = None
        for lvl, factor in enumerate(factors):
            log("Pyramid factor", factor)
            shape = mov_pyr[lvl].shape
            grid = TileGrid.for_image(shape, self.tile_size, self.overlap)
            pre_warp = lvl != 0
            whole_image = max(shape) / self.tile_size < 2

            with stage_timer(f"lvl{factor} fused level"):
                this_flow, mi_after, mi_before = _fused_level(
                    ref_pyr[lvl],
                    mov_pyr[lvl],
                    # unused when pre_warp=False: tiny dummy, not a full-size zeros
                    m_flow if pre_warp else jnp.zeros((1, 1, 2), jnp.float32),
                    grid, win_size, self.num_iterations, self.use_dog,
                    self.tile_size, pre_warp, whole_image, dtype_name,
                )
                mi_after = float(mi_after)
                mi_before = float(mi_before)
            log("    MI score after:", mi_after, "| MI score before:", mi_before)
            is_higher_similarity = [mi_after > mi_before]

            if any(is_higher_similarity):
                log("    Better alignment than before")
                if lvl == 0:
                    if num_lvl > 1:
                        m_flow = self._pyr_up_dev(this_flow * 2, mov_pyr[lvl + 1].shape)
                    else:
                        m_flow = self._upscale_flow_to_full_res(this_flow, factor)
                elif lvl == num_lvl - 1:
                    m_flow = self._merge_list_of_flows([m_flow, this_flow])
                    if not self.use_full_res_img:
                        m_flow = self._upscale_flow_to_full_res(m_flow, factor)
                else:
                    m_flow = self._merge_list_of_flows([m_flow, this_flow])
                    m_flow = self._pyr_up_dev(m_flow * 2, mov_pyr[lvl + 1].shape)
            else:
                log("    Worse alignment than before")
                if lvl == 0:
                    if num_lvl > 1:
                        shape = list(mov_pyr[lvl + 1].shape)
                    else:
                        shape = list(self._mov_img.shape)
                    m_flow = jnp.zeros(shape + [2], dtype=jnp.float32)
                elif lvl == num_lvl - 1:
                    if not self.use_full_res_img:
                        m_flow = self._pyr_up_dev(m_flow * 2, self._mov_img.shape)
                else:
                    mult = 4 if self.replicate_reject_upscale_bug else 2
                    m_flow = self._pyr_up_dev(m_flow * mult, mov_pyr[lvl + 1].shape)

        return np.asarray(jax.device_get(m_flow))

    # -- helpers -----------------------------------------------------------

    def _calc_flow_dev(self, ref_img, mov_img, win_size: int):
        """Device-resident TileFlowCalc (flow_calc.py:59-84 semantics)."""
        from microaligner_tpu.optflow.farneback import farneback
        from microaligner_tpu.optflow.flow_calc import calc_flow_tiled

        if max(ref_img.shape) / self.tile_size < 2:
            return farneback(
                mov_img, ref_img, win_size=win_size, num_iter=self.num_iterations
            )
        grid = TileGrid.for_image(ref_img.shape, self.tile_size, self.overlap)
        return calc_flow_tiled(ref_img, mov_img, grid, win_size, self.num_iterations)

    @staticmethod
    def _pyr_up_dev(flow, dst_shape):
        return pyr_up(flow, (int(dst_shape[0]), int(dst_shape[1])))

    def _generate_img_pyr(self, arr) -> Tuple[List, List[int]]:
        """Smallest-first pyramid; stop when a dim would drop below 100 px
        (optflow_registrator.py:175-202).  Levels are device arrays."""
        if self.num_pyr_lvl < 0:
            raise ValueError("Number of pyramid levels cannot be less than 0")
        if self.num_pyr_lvl == 0 and not self.use_full_res_img:
            raise ValueError(
                "Number of pyramid levels is 0 and use_full_res_img is False. "
                "Please change one of the parameters"
            )
        pyramid, factors = _build_pyramid(arr, self.num_pyr_lvl, self.use_full_res_img)
        if not factors:
            # without this the level loop would not run and register() would
            # silently return the (1, 1, 2) dummy flow
            raise ValueError(
                f"Image {tuple(arr.shape)} is too small for any pyramid level "
                "(min dim 100 px after downscale) and use_full_res_img is "
                "False; enable use_full_res_img or reduce num_pyr_lvl"
            )
        return pyramid, factors

    def _upscale_flow_to_full_res(self, flow: np.ndarray, pyramid_factor: int) -> np.ndarray:
        """Chain of pyrUps to full resolution (optflow_registrator.py:204-215).

        NOTE: the reference's loop re-upscales from the ORIGINAL flow on the
        last step (a quirk at :211 — intermediate pyrUps are discarded), so
        effectively one pyrUp from `flow` to the final size; values are NOT
        doubled here (that is the caller's job).  Replicated exactly.
        """
        if abs(flow.shape[0] - self._ref_img.shape[0]) <= 1:
            return flow
        import math

        num_lvls = int(math.log2(pyramid_factor))
        upscaled = flow
        for i in range(num_lvls):
            if i == num_lvls - 1:
                upscaled = self._pyr_up_dev(flow, self._ref_img.shape)
            else:
                h, w = upscaled.shape[:2]
                upscaled = self._pyr_up_dev(upscaled, (h * 2, w * 2))
        return upscaled

    def _merge_flow_in_tiles(self, flow1, flow2):
        """Tile-wise flow composition (optflow_registrator.py:217-233),
        device-resident and batch-bounded."""
        from microaligner_tpu.optflow.warper import compose_flows_tiled

        grid = TileGrid.for_image(flow1.shape, self.tile_size, self.overlap)
        return compose_flows_tiled(jnp.asarray(flow1), jnp.asarray(flow2), grid)

    def _merge_list_of_flows(self, flow_list: List[np.ndarray]) -> np.ndarray:
        m_flow = flow_list[0]
        for nxt in flow_list[1:]:
            m_flow = self._merge_flow_in_tiles(m_flow, nxt)
        return m_flow
