"""Pipeline orchestration: config -> dataset struct -> register -> warp -> save.

Behavioral re-implementation of the reference CLI driver (__main__.py):

* FeatureReg registers every cycle to one fixed reference cycle, then applies
  the affine to every channel/z-plane and writes BigTIFF output + a CSV of
  transform parameters (``feature_reg_parameters.csv``).
* OptFlowReg chains sequentially (cycle n registers to the *warped* cycle
  n-1), reusing FeatureReg output files when both stages run.
* Output modes: one combined TCZYX stack or one file per cycle, with rebuilt
  OME-XML (io/ome.create_new_meta).
* Auto-fallback: optflow-only inputs with mismatched dims trigger FeatureReg
  first (reference __main__.py:560-574).
"""

from __future__ import annotations

import csv
import functools
import os
from pathlib import Path
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from microaligner_tpu.utils.logging import log, stage_timer

from microaligner_tpu.features import FeatureRegistrator
from microaligner_tpu.io.ome import create_new_meta
from microaligner_tpu.io.tiff import MemmapWriter, TiffFile, read_tiff_page
from microaligner_tpu.ops.pad import pad_to_shape
from microaligner_tpu.ops.warp import transform_img_with_tmat
from microaligner_tpu.optflow import OptFlowRegistrator, Warper
from microaligner_tpu.pipeline.apply import stream_apply
from microaligner_tpu.pipeline.config import PipelineConfig
from microaligner_tpu.pipeline.dataset import DatasetStruct, DatasetStructCreator
from microaligner_tpu.utils.pages import read_and_max_project_pages
from microaligner_tpu.utils.workers import set_number_of_workers

__all__ = ["run_pipeline", "run_feature_reg", "run_opt_flow_reg", "get_target_shape"]


def _first_value(d: dict):
    return d[list(d.keys())[0]]


def get_target_shape(img_paths: List[Path]) -> Tuple[int, int]:
    """Max (H, W) across inputs (reference __main__.py:218-230)."""
    shapes = []
    for p in img_paths:
        with TiffFile(p) as tf:
            s = tf.series[0]
            y_ax = s.axes.index("Y")
            x_ax = s.axes.index("X")
            shapes.append((s.shape[y_ax], s.shape[x_ax]))
    return max(s[0] for s in shapes), max(s[1] for s in shapes)


def check_input_img_dims_match(img_paths: List[Path]) -> bool:
    shapes = []
    for p in img_paths:
        with TiffFile(p) as tf:
            s = tf.series[0]
            shapes.append((s.shape[s.axes.index("Y")], s.shape[s.axes.index("X")]))
    return all(s == shapes[0] for s in shapes)


def save_param(out_dir: Path, tmat_per_cycle, padding_per_cycle, image_shape):
    """feature_reg_parameters.csv with 6 tmat coeffs + padding + size
    (reference __main__.py:47-80)."""
    cols = ["name", "0", "1", "2", "3", "4", "5", "left", "right", "top", "bottom", "width", "height"]
    with open(out_dir / "feature_reg_parameters.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(cols)
        for cyc in tmat_per_cycle:
            flat = np.asarray(tmat_per_cycle[cyc], dtype=float).flatten().tolist()
            pad = padding_per_cycle[cyc]
            w.writerow(
                [f"Cycle {cyc}"] + flat + list(pad) + [image_shape[1], image_shape[0]]
            )


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def _pad_plane(img, out_h, out_w):
    from microaligner_tpu.ops.pad import calculate_padding_size

    left, right = calculate_padding_size(out_w, img.shape[1])
    top, bottom = calculate_padding_size(out_h, img.shape[0])
    return jnp.pad(img, ((top, bottom), (left, right)))


def _apply_affine_plane(img, inv_np, out_h, out_w, dtype_name, warp):
    """Device-side pad(+affine) of one plane, preserving dtype.

    Matches transform_img_with_tmat semantics (pad -> pinv warp -> truncate
    astype, shared_modules/utils.py:98-114) but stays on device so the apply
    phase can stream (dispatches are async).  ``inv_np`` is the host 2x3
    dst->src matrix: near-identity transforms take the gather-free tiled
    band path (ops/affine_tiled.py); others the exact bilinear gather.
    """
    from microaligner_tpu.ops.affine_tiled import affine_warp_tiled
    from microaligner_tpu.ops.warp import _affine_warp_core

    padded = _pad_plane(img, out_h, out_w)
    if not warp:
        return padded
    out = affine_warp_tiled(padded.astype(jnp.float32), inv_np, out_h, out_w)
    if out is None:
        out = _affine_warp_core(
            padded.astype(jnp.float32), jnp.asarray(inv_np, jnp.float32), out_h, out_w
        )
    return _cast_trunc(out, dtype_name)


@functools.partial(jax.jit, static_argnames=("dtype_name",))
def _cast_trunc(out, dtype_name):
    return out.astype(jnp.dtype(dtype_name))  # truncating cast, like astype


@functools.partial(jax.jit, static_argnames=("grid", "dtype_name"))
def _apply_flow_plane(img, flow, grid, dtype_name):
    """Device-side tiled warp of one plane, rounded back to its dtype
    (cv.remap on integer images rounds)."""
    from microaligner_tpu.optflow.warper import warp_tiled

    out = warp_tiled(img, flow, grid)
    dt = jnp.dtype(dtype_name)
    if jnp.issubdtype(dt, jnp.integer):
        info = jnp.iinfo(dt)
        out = jnp.clip(jnp.round(out), info.min, info.max)
    return out.astype(dt)


@functools.partial(jax.jit, static_argnames=("grid", "dtype_name"))
def _apply_flow_planes(imgs, flow, grid, dtype_name):
    """Device-side tiled warp of N planes sharing one flow (the cycle's
    channel/z stack — reference __main__.py:288-302), rounded to dtype.

    Default: a scanned per-plane banded warp — on hardware (8x u16 4096^2,
    2026-08-19) it runs 0.058 s vs 0.082 s for the shared-weight multi-plane
    kernel, whose honest scoped-VMEM block sizing forces narrower lane
    blocks (3 column steps + 34% pad waste), and whose full-width variant
    compiles pathologically slowly (>7 min).  The multi-plane kernel stays
    available via MICROALIGNER_TPU_MULTI_APPLY=1 (trace-time knob)."""
    if os.environ.get("MICROALIGNER_TPU_MULTI_APPLY", "0") == "1":
        from microaligner_tpu.optflow.warper import warp_planes_tiled

        return warp_planes_tiled(imgs, flow, grid, dtype_name)
    return jax.lax.map(
        lambda im: _apply_flow_plane(im, flow, grid, dtype_name), imgs
    )


def _dims_of_struct(struct: DatasetStruct):
    nz = [len(struct.tiff_pages[c][ch]) for c in struct.tiff_pages for ch in struct.tiff_pages[c]]
    nch = [len(struct.tiff_pages[c]) for c in struct.tiff_pages]
    return max(nz), sum(nch), nch


def do_feature_reg(
    struct: DatasetStruct,
    ref_cycle_id: int,
    num_pyr_lvl: int,
    num_iter: int,
    tile_size: int,
    target_shape,
    use_full_res_img: bool,
    use_dog: bool,
):
    freg = FeatureRegistrator()
    freg.num_pyr_lvl = num_pyr_lvl
    freg.num_iterations = num_iter
    freg.tile_size = tile_size
    freg.use_full_res_img = use_full_res_img
    freg.use_dog = use_dog

    tmat_per_cycle: Dict[int, np.ndarray] = {}
    padding: Dict[int, tuple] = {}
    identity = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])

    ref_ch = struct.ref_channel_ids[ref_cycle_id]
    ref_img = read_and_max_project_pages(
        struct.img_paths[ref_cycle_id][ref_ch], struct.tiff_pages[ref_cycle_id][ref_ch]
    )
    ref_img, ref_pad = pad_to_shape(ref_img, target_shape)
    freg.ref_img = ref_img

    cycles = list(struct.tiff_pages.keys())
    for cyc_id, cyc in enumerate(cycles):
        log(f"Processing Cycle {cyc} [{cyc_id + 1}/{len(cycles)}]")
        if cyc == ref_cycle_id:
            log("Skipping as it is a reference cycle")
            tmat_per_cycle[cyc] = identity
            padding[cyc] = ref_pad
            continue
        ch = struct.ref_channel_ids[cyc]
        mov_img = read_and_max_project_pages(struct.img_paths[cyc][ch], struct.tiff_pages[cyc][ch])
        mov_img, pad = pad_to_shape(mov_img, target_shape)
        padding[cyc] = pad
        freg.mov_img = mov_img
        tmat_per_cycle[cyc] = freg.register(reuse_ref_img=True)
    return tmat_per_cycle, padding


def transform_and_save_freg_imgs(
    struct: DatasetStruct,
    out_dir: Path,
    filenames: Dict[str, str],
    target_shape,
    tmat_per_cycle,
    ome_meta_per_cyc: Dict[int, str],
    save_to_stack: bool,
):
    log("Transforming images")
    cycles = sorted(struct.tiff_pages.keys())
    first_cycle = cycles[0]
    img_path = _first_value(_first_value(struct.img_paths[first_cycle]))
    with TiffFile(img_path) as tf:
        img_dtype = tf.series[0].dtype

    max_z, total_ch, nch_per_cyc = _dims_of_struct(struct)

    mm = None
    if save_to_stack:
        mm = MemmapWriter(
            out_dir / filenames["stack"],
            (1, total_ch, max_z, target_shape[0], target_shape[1]),
            img_dtype,
            description=ome_meta_per_cyc[first_cycle],
        )

    for cyc_id, cyc in enumerate(struct.tiff_pages):
        log(f"Transforming and saving Cycle {cyc} [{cyc_id + 1}/{len(cycles)}]")
        if not save_to_stack:
            nch = len(struct.tiff_pages[cyc])
            mm = MemmapWriter(
                out_dir / filenames["per_cycle"].format(cyc=cyc),
                (1, nch, max_z, target_shape[0], target_shape[1]),
                img_dtype,
                description=ome_meta_per_cyc[cyc],
            )
        tmat = np.asarray(tmat_per_cycle[cyc], dtype=np.float64)
        is_identity = np.array_equal(tmat, np.eye(2, 3))
        inv = jnp.asarray(
            np.linalg.pinv(np.vstack([tmat, [0.0, 0.0, 1.0]]))[:2], jnp.float32
        )
        out_h, out_w = int(target_shape[0]), int(target_shape[1])

        def planes():
            for ch_id, ch in enumerate(struct.tiff_pages[cyc]):
                out_ch = sum(nch_per_cyc[:cyc_id]) + ch_id if save_to_stack else ch_id  # cumulative: correct for heterogeneous per-cycle channel counts (the reference assumes cycle 0's count, __main__.py:199,412)
                pages = struct.tiff_pages[cyc][ch]
                paths = struct.img_paths[cyc][ch]
                for z_id, z in enumerate(paths):
                    yield (out_ch, z_id), read_tiff_page(paths[z], pages[z])
                for extra_z in range(len(pages), max_z):
                    mm[0, out_ch, extra_z] = 0

        def device_fn(img):
            return _apply_affine_plane(
                jnp.asarray(img), inv, out_h, out_w,
                np.dtype(img_dtype).name, not is_identity,
            )

        def write_fn(key, plane):
            out_ch, z_id = key
            mm[0, out_ch, z_id] = plane
            mm.flush()

        stream_apply(planes(), device_fn, write_fn)
        if not save_to_stack:
            mm.close()
    if save_to_stack:
        mm.close()


def run_feature_reg(config: PipelineConfig, target_shape) -> Dict:
    log("Performing linear feature based image registration")
    inp = config.Input
    out_dir = Path(config.Output.OutputDir)
    out_prefix = config.Output.OutputPrefix
    output_is_stack = config.Output.SaveOutputToCycleStack
    input_is_stack = inp.PipelineInputType == "CycleStack"
    p = config.RegistrationParameters.FeatureReg

    set_number_of_workers(p.NumberOfWorkers)
    struct_creator = DatasetStructCreator()
    struct_creator.img_paths = inp.InputImagePaths
    struct_creator.input_is_stack = input_is_stack
    struct_creator.input_is_stack_builder = inp.PipelineInputType == "CycleBuilder"
    struct_creator.output_is_stack = output_is_stack
    struct_creator.ref_channel_name = inp.ReferenceChannel
    struct = struct_creator.create_dataset_struct()

    new_ome = create_new_meta(struct.ome_xmls, target_shape, input_is_stack, output_is_stack)
    tmat_per_cycle, padding = do_feature_reg(
        struct, inp.ReferenceCycle, p.NumberPyramidLevels, p.NumberIterationsPerLevel,
        p.TileSize, target_shape, p.UseFullResImage, p.UseDOG,
    )
    filenames = {
        "stack": out_prefix + "feature_reg_result_stack.tif",
        "per_cycle": out_prefix + "feature_reg_result_cyc{cyc:03d}.tif",
    }
    transform_and_save_freg_imgs(
        struct, out_dir, filenames, target_shape, tmat_per_cycle, new_ome, output_is_stack
    )
    save_param(out_dir, tmat_per_cycle, padding, target_shape)
    if output_is_stack:
        return {"CycleStack": out_dir / filenames["stack"]}
    return {cyc: out_dir / filenames["per_cycle"].format(cyc=cyc) for cyc in struct.img_paths}


def register_and_save_ofreg_imgs(
    struct: DatasetStruct,
    out_dir: Path,
    filenames: Dict[str, str],
    tile_size: int,
    overlap: int,
    num_pyr_lvl: int,
    num_iter: int,
    ome_meta_per_cyc: Dict[int, str],
    save_to_stack: bool,
    use_full_res_img: bool,
    use_dog: bool,
):
    """Sequential chain 1<-2, 2<-3, ... (reference __main__.py:320-437)."""
    ofreg = OptFlowRegistrator()
    ofreg.tile_size = tile_size
    ofreg.overlap = overlap
    ofreg.num_pyr_lvl = num_pyr_lvl
    ofreg.num_iterations = num_iter
    ofreg.use_full_res_img = use_full_res_img
    ofreg.use_dog = use_dog
    warper = Warper()
    warper.tile_size = tile_size
    warper.overlap = overlap

    cycles = list(struct.tiff_pages.keys())
    first_cycle = cycles[0]
    img_path = _first_value(_first_value(struct.img_paths[first_cycle]))
    with TiffFile(img_path) as tf:
        s = tf.series[0]
        img_shape = s.shape
        img_dtype = s.dtype
    max_z, total_ch, nch_per_cyc = _dims_of_struct(struct)

    mm = None
    if save_to_stack:
        mm = MemmapWriter(
            out_dir / filenames["stack"],
            (1, total_ch, max_z, img_shape[-2], img_shape[-1]),
            img_dtype,
            description=ome_meta_per_cyc[first_cycle],
        )

    ref_img = None
    for cyc_id, cyc in enumerate(cycles):
        log(f"Processing Cycle {cyc} [{cyc_id + 1}/{len(cycles)}]")
        if not save_to_stack:
            nch = len(struct.tiff_pages[cyc])
            mm = MemmapWriter(
                out_dir / filenames["per_cycle"].format(cyc=cyc),
                (1, nch, max_z, img_shape[-2], img_shape[-1]),
                img_dtype,
                description=ome_meta_per_cyc[cyc],
            )
        ref_ch = struct.ref_channel_ids[cyc]
        paths = struct.img_paths[cyc][ref_ch]
        pages = struct.tiff_pages[cyc][ref_ch]

        if cyc == first_cycle:
            log("Skipping as it is a reference image")
            ref_img = read_and_max_project_pages(paths, pages)
            for ch_id, ch in enumerate(struct.tiff_pages[cyc]):
                out_ch = sum(nch_per_cyc[:cyc_id]) + ch_id if save_to_stack else ch_id  # cumulative: correct for heterogeneous per-cycle channel counts (the reference assumes cycle 0's count, __main__.py:199,412)
                for z_id, z in enumerate(struct.img_paths[cyc][ch]):
                    mm[0, out_ch, z_id] = read_tiff_page(
                        struct.img_paths[cyc][ch][z], struct.tiff_pages[cyc][ch][z]
                    )
                    mm.flush()
        else:
            mov_img = read_and_max_project_pages(paths, pages)
            ofreg.ref_img = ref_img
            ofreg.mov_img = mov_img
            # the flow never visits the host: register_device() hands the
            # device array straight to the warp/apply stages (a host round
            # trip is 2 x 3.2 GB of f32 at 20k x 20k)
            flow_dev = ofreg.register_device()
            warper.image = mov_img
            warper.flow = flow_dev
            # next cycle registers against this; stays on device (its only
            # consumer is the next register_device call)
            ref_img = warper.warp_device()
            log(f"Saving Cycle {cyc} [{cyc_id + 1}/{len(cycles)}]")
            from microaligner_tpu.pipeline.apply import stream_apply
            from microaligner_tpu.tiles import TileGrid

            grid = TileGrid.for_image(tuple(flow_dev.shape[:2]), tile_size, overlap)

            def planes():
                for ch_id, ch in enumerate(struct.tiff_pages[cyc]):
                    out_ch = sum(nch_per_cyc[:cyc_id]) + ch_id if save_to_stack else ch_id  # cumulative: correct for heterogeneous per-cycle channel counts (the reference assumes cycle 0's count, __main__.py:199,412)
                    for z_id, z in enumerate(struct.img_paths[cyc][ch]):
                        yield (out_ch, z_id), read_tiff_page(
                            struct.img_paths[cyc][ch][z], struct.tiff_pages[cyc][ch][z]
                        )

            def device_fn(img):
                return _apply_flow_plane(
                    jnp.asarray(img), flow_dev, grid, np.dtype(img_dtype).name
                )

            def write_fn(key, plane):
                out_ch, z_id = key
                mm[0, out_ch, z_id] = plane
                mm.flush()

            stream_apply(planes(), device_fn, write_fn)
        if not save_to_stack:
            mm.close()
    if save_to_stack:
        mm.close()


def run_opt_flow_reg(config: PipelineConfig, img_paths, target_shape):
    inp = config.Input
    out_dir = Path(config.Output.OutputDir)
    out_prefix = config.Output.OutputPrefix
    output_is_stack = config.Output.SaveOutputToCycleStack
    input_is_stack = inp.PipelineInputType == "CycleStack"
    input_is_stack_builder = inp.PipelineInputType == "CycleBuilder"
    p = config.RegistrationParameters.OptFlowReg

    need_freg = False
    if config.RegistrationParameters.FeatureReg is not None:
        input_is_stack_of = output_is_stack
        input_is_stack_builder = False
    else:
        input_is_stack_of = input_is_stack
        if not input_is_stack_of:
            paths = [Path(v) for v in config.Input.InputImagePaths.values()]
            if not check_input_img_dims_match(paths):
                log(
                    "Image dimensions do not match. "
                    "This probably means that they are not aligned. "
                    "Will try to perform FeatureReg first"
                )
                config.RegistrationParameters.FeatureReg = p
                need_freg = True
    if need_freg:
        img_paths = run_feature_reg(config, target_shape)
        input_is_stack_of = output_is_stack

    set_number_of_workers(p.NumberOfWorkers)
    struct_creator = DatasetStructCreator()
    struct_creator.img_paths = img_paths
    struct_creator.input_is_stack = input_is_stack_of
    struct_creator.input_is_stack_builder = input_is_stack_builder
    struct_creator.output_is_stack = output_is_stack
    struct_creator.ref_channel_name = inp.ReferenceChannel
    struct = struct_creator.create_dataset_struct()

    new_ome = create_new_meta(struct.ome_xmls, target_shape, input_is_stack_of, output_is_stack)
    filenames = {
        "stack": out_prefix + "optflow_reg_result_stack.tif",
        "per_cycle": out_prefix + "optflow_reg_result_cyc{cyc:03d}.tif",
    }
    log("Performing non-linear optical flow based image registration")
    register_and_save_ofreg_imgs(
        struct, out_dir, filenames, p.TileSize, p.Overlap, p.NumberPyramidLevels,
        p.NumberIterationsPerLevel, new_ome, output_is_stack, p.UseFullResImage, p.UseDOG,
    )
    log("Finished\n")


def get_img_path_list(config: PipelineConfig) -> List[Path]:
    if config.Input.PipelineInputType == "CycleBuilder":
        return [
            config.Input.InputImagePaths[cyc][ch]
            for cyc in config.Input.InputImagePaths
            for ch in config.Input.InputImagePaths[cyc]
        ]
    return [Path(p) for p in config.Input.InputImagePaths.values()]


def run_pipeline(config: PipelineConfig):
    out_dir = Path(config.Output.OutputDir)
    out_dir.mkdir(parents=True, exist_ok=True)
    target_shape = get_target_shape(get_img_path_list(config))
    img_paths = config.Input.InputImagePaths
    if config.RegistrationParameters.FeatureReg is not None:
        img_paths = run_feature_reg(config, target_shape)
    if config.RegistrationParameters.OptFlowReg is not None:
        run_opt_flow_reg(config, img_paths, target_shape)
