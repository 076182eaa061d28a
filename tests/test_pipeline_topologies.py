"""Pipeline E2E over the other input topologies: CycleStack, CycleBuilder,
and per-cycle output mode."""

import cv2 as cv
import numpy as np
import pytest
import yaml

from microaligner_tpu.io import MemmapWriter, TiffFile
from microaligner_tpu.pipeline.config import PipelineConfigReader
from microaligner_tpu.pipeline.runner import run_pipeline


def _ome(nc, nz, h, w, channels, dtype="uint16"):
    chs = "".join(
        f'<Channel ID="Channel:0:{i}" Name="{n}" SamplesPerPixel="1"/>'
        for i, n in enumerate(channels)
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06"><Image ID="Image:0" Name="t">'
        f'<Pixels ID="Pixels:0" DimensionOrder="XYZCT" Type="{dtype}" SizeT="1" SizeC="{nc}" SizeZ="{nz}" '
        f'SizeY="{h}" SizeX="{w}" PhysicalSizeX="0.5" PhysicalSizeXUnit="um" PhysicalSizeY="0.5" PhysicalSizeYUnit="um">'
        + chs + "</Pixels></Image></OME>"
    )


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    rng = np.random.default_rng(7)
    base = cv.GaussianBlur(rng.random((240, 250), dtype=np.float32), (0, 0), 2.0)
    base = cv.normalize(base, None, 0, 50000, cv.NORM_MINMAX, cv.CV_16U)
    other = (base * 0.6).astype(np.uint16)
    fwd = np.float32([[1, 0, 5.0], [0, 1, -3.0]])
    s = lambda im: cv.warpAffine(im.astype(np.float32), fwd, (250, 240)).astype(np.uint16)
    return base, other, s(base), s(other)


def _reg_params():
    return {
        "FeatureReg": dict(NumberPyramidLevels=1, NumberIterationsPerLevel=2, TileSize=300,
                           Overlap=50, NumberOfWorkers=0, UseFullResImage=True, UseDOG=True)
    }


def _check_registered(out_tif, page_ref, page_reg, truth_ref):
    with TiffFile(out_tif) as tf:
        ref_plane = tf.read_page(page_ref)
        reg_plane = tf.read_page(page_reg)
    inner = (slice(30, -30), slice(30, -30))
    np.testing.assert_array_equal(ref_plane, truth_ref)
    mse = np.mean((reg_plane[inner].astype(float) - truth_ref[inner].astype(float)) ** 2)
    assert mse < 50000, f"registered plane MSE too high: {mse}"


class TestCycleStackInput:
    def test_stack_in_stack_out(self, images, tmp_path):
        base, other, sbase, sother = images
        # one stack: 2 cycles x 2 channels (DAPI, Cy5) x 1 z
        stack = tmp_path / "stack.ome.tif"
        ome = _ome(4, 1, 240, 250, ("c01 DAPI", "c01 Cy5", "c02 DAPI", "c02 Cy5"))
        mm = MemmapWriter(stack, (1, 4, 1, 240, 250), np.uint16, description=ome)
        for i, img in enumerate([base, other, sbase, sother]):
            mm[0, i, 0] = img
        mm.close()

        cfg = {
            "Input": {"InputImagePaths": {"CycleStack": str(stack)},
                      "ReferenceCycle": 1, "ReferenceChannel": "DAPI"},
            "Output": {"OutputDir": str(tmp_path / "out"), "OutputPrefix": "",
                       "SaveOutputToCycleStack": True},
            "RegistrationParameters": _reg_params(),
        }
        p = tmp_path / "c.yaml"
        p.write_text(yaml.dump(cfg, sort_keys=False))
        run_pipeline(PipelineConfigReader().read_config(p))
        out = tmp_path / "out" / "feature_reg_result_stack.tif"
        assert out.exists()
        _check_registered(out, 0, 2, base)

    def test_stack_in_split_out(self, images, tmp_path):
        base, other, sbase, sother = images
        stack = tmp_path / "stack.ome.tif"
        ome = _ome(4, 1, 240, 250, ("c01 DAPI", "c01 Cy5", "c02 DAPI", "c02 Cy5"))
        mm = MemmapWriter(stack, (1, 4, 1, 240, 250), np.uint16, description=ome)
        for i, img in enumerate([base, other, sbase, sother]):
            mm[0, i, 0] = img
        mm.close()
        cfg = {
            "Input": {"InputImagePaths": {"CycleStack": str(stack)},
                      "ReferenceCycle": 1, "ReferenceChannel": "DAPI"},
            "Output": {"OutputDir": str(tmp_path / "out2"), "OutputPrefix": "",
                       "SaveOutputToCycleStack": False},
            "RegistrationParameters": _reg_params(),
        }
        p = tmp_path / "c.yaml"
        p.write_text(yaml.dump(cfg, sort_keys=False))
        run_pipeline(PipelineConfigReader().read_config(p))
        c1 = tmp_path / "out2" / "feature_reg_result_cyc001.tif"
        c2 = tmp_path / "out2" / "feature_reg_result_cyc002.tif"
        assert c1.exists() and c2.exists()
        with TiffFile(c1) as tf:
            assert len(tf.pages) == 2  # 2 channels x 1 z
            np.testing.assert_array_equal(tf.read_page(0), base)
            assert "SizeC" in tf.ome_metadata and 'SizeC="2"' in tf.ome_metadata


class TestCycleBuilderInput:
    def test_builder_in_stack_out(self, images, tmp_path):
        base, other, sbase, sother = images
        paths = {}
        for name, img in [("c1_dapi", base), ("c1_cy5", other),
                          ("c2_dapi", sbase), ("c2_cy5", sother)]:
            p = tmp_path / f"{name}.tif"
            cv.imwrite(str(p), img)  # plain (LZW) TIFF, no OME
            paths[name] = str(p)

        cfg = {
            "Input": {
                "InputImagePaths": {
                    "Cycle 1": {"DAPI": paths["c1_dapi"], "Cy5": paths["c1_cy5"]},
                    "Cycle 2": {"DAPI": paths["c2_dapi"], "Cy5": paths["c2_cy5"]},
                },
                "ReferenceCycle": 1,
                "ReferenceChannel": "DAPI",
            },
            "Output": {"OutputDir": str(tmp_path / "out"), "OutputPrefix": "b_",
                       "SaveOutputToCycleStack": True},
            "RegistrationParameters": _reg_params(),
        }
        p = tmp_path / "c.yaml"
        p.write_text(yaml.dump(cfg, sort_keys=False))
        run_pipeline(PipelineConfigReader().read_config(p))
        out = tmp_path / "out" / "b_feature_reg_result_stack.tif"
        assert out.exists()
        _check_registered(out, 0, 2, base)
