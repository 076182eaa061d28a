"""End-to-end pipeline tests: YAML config -> registration -> BigTIFF output.

Synthetic multi-cycle OME-TIFFs with known affine/elastic distortions; assert
the pipeline recovers alignment (output planes match the reference cycle) and
writes valid OME BigTIFF + the transform CSV.
"""

import csv

import cv2 as cv
import numpy as np
import pytest
import yaml

from microaligner_tpu.io import MemmapWriter, TiffFile
from microaligner_tpu.pipeline.config import PipelineConfigReader
from microaligner_tpu.pipeline.runner import run_pipeline, get_target_shape


def _ome_two_channel(size_z, size_y, size_x, channels, dtype="uint16"):
    chs = "".join(
        f'<Channel ID="Channel:0:{i}" Name="{n}" SamplesPerPixel="1"/>'
        for i, n in enumerate(channels)
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
        '<Image ID="Image:0" Name="t">'
        f'<Pixels ID="Pixels:0" DimensionOrder="XYZCT" Type="{dtype}" SizeT="1" '
        f'SizeC="{len(channels)}" SizeZ="{size_z}" SizeY="{size_y}" SizeX="{size_x}" '
        'PhysicalSizeX="0.5" PhysicalSizeXUnit="um" PhysicalSizeY="0.5" PhysicalSizeYUnit="um">'
        + chs + "</Pixels></Image></OME>"
    )


def _make_cycle_tiff(path, planes, channels):
    """planes: dict[(c, z)] -> 2-D u16 array"""
    nc = len(channels)
    nz = max(z for _, z in planes) + 1
    h, w = planes[(0, 0)].shape
    mm = MemmapWriter(path, (1, nc, nz, h, w), np.uint16,
                      description=_ome_two_channel(nz, h, w, channels))
    for (c, z), img in planes.items():
        mm[0, c, z] = img
    mm.close()


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    """Two cycles, 2 channels, 2 z-planes; cycle 2 translated by (7, -4)."""
    rng = np.random.default_rng(123)
    d = tmp_path_factory.mktemp("ds")
    base = cv.GaussianBlur(rng.random((260, 280), dtype=np.float32), (0, 0), 2.0)
    base = cv.normalize(base, None, 0, 60000, cv.NORM_MINMAX, cv.CV_16U)
    other = cv.GaussianBlur(rng.random((260, 280), dtype=np.float32), (0, 0), 3.0)
    other = cv.normalize(other, None, 0, 60000, cv.NORM_MINMAX, cv.CV_16U)

    fwd = np.float32([[1, 0, 7.0], [0, 1, -4.0]])  # applied to produce cycle 2

    def shift(img):
        return cv.warpAffine(img.astype(np.float32), fwd, (280, 260)).astype(np.uint16)

    cyc1 = {(0, 0): base, (0, 1): (base * 0.8).astype(np.uint16),
            (1, 0): other, (1, 1): (other * 0.7).astype(np.uint16)}
    cyc2 = {k: shift(v) for k, v in cyc1.items()}
    _make_cycle_tiff(d / "cyc1.ome.tif", cyc1, ("DAPI", "Cy5"))
    _make_cycle_tiff(d / "cyc2.ome.tif", cyc2, ("DAPI", "Cy5"))
    return d, cyc1, cyc2, fwd


def _config(ds_dir, out_dir, feature=True, optflow=False, stack_out=True):
    reg = {}
    common = dict(NumberPyramidLevels=1, NumberIterationsPerLevel=2, TileSize=300,
                  Overlap=50, NumberOfWorkers=0, UseFullResImage=True, UseDOG=True)
    if feature:
        reg["FeatureReg"] = dict(common)
    if optflow:
        reg["OptFlowReg"] = dict(common, UseDOG=False, NumberPyramidLevels=1)
    return {
        "Input": {
            "InputImagePaths": {
                "Cycle 1": str(ds_dir / "cyc1.ome.tif"),
                "Cycle 2": str(ds_dir / "cyc2.ome.tif"),
            },
            "ReferenceCycle": 1,
            "ReferenceChannel": "DAPI",
        },
        "Output": {
            "OutputDir": str(out_dir),
            "OutputPrefix": "test_",
            "SaveOutputToCycleStack": stack_out,
        },
        "RegistrationParameters": reg,
    }


class TestConfigReader:
    def test_reads_and_validates(self, synthetic_dataset, tmp_path):
        ds_dir, *_ = synthetic_dataset
        cfg_path = tmp_path / "c.yaml"
        cfg_path.write_text(yaml.dump(_config(ds_dir, tmp_path / "out"), sort_keys=False))
        cfg = PipelineConfigReader().read_config(cfg_path)
        assert cfg.Input.PipelineInputType == "CyclePerImage"
        assert cfg.Input.InputImagePaths[1].name == "cyc1.ome.tif"
        assert cfg.RegistrationParameters.OptFlowReg is None

    def test_rejects_bad_bounds(self, synthetic_dataset, tmp_path):
        ds_dir, *_ = synthetic_dataset
        bad = _config(ds_dir, tmp_path / "o")
        bad["RegistrationParameters"]["FeatureReg"]["TileSize"] = 5
        p = tmp_path / "bad.yaml"
        p.write_text(yaml.dump(bad, sort_keys=False))
        with pytest.raises(ValueError, match="TileSize"):
            PipelineConfigReader().read_config(p)

    def test_target_shape(self, synthetic_dataset):
        ds_dir, *_ = synthetic_dataset
        assert get_target_shape([ds_dir / "cyc1.ome.tif", ds_dir / "cyc2.ome.tif"]) == (260, 280)


class TestFeatureRegPipeline:
    def test_e2e_stack_output(self, synthetic_dataset, tmp_path):
        ds_dir, cyc1, cyc2, fwd = synthetic_dataset
        out_dir = tmp_path / "out"
        cfg_path = tmp_path / "c.yaml"
        cfg_path.write_text(yaml.dump(_config(ds_dir, out_dir), sort_keys=False))
        cfg = PipelineConfigReader().read_config(cfg_path)
        run_pipeline(cfg)

        out = out_dir / "test_feature_reg_result_stack.tif"
        assert out.exists()
        with TiffFile(out) as tf:
            s = tf.series[0]
            assert s.shape == (4, 2, 260, 280)  # 2 cycles x 2 ch, 2 z
            assert tf.ome_metadata and "c01 DAPI" in tf.ome_metadata
            ref_plane = tf.read_page(0)
            reg_plane = tf.read_page(4)  # cycle2 DAPI z0, registered
        inner = (slice(30, -30), slice(30, -30))
        np.testing.assert_array_equal(ref_plane, cyc1[(0, 0)])
        before = np.mean((cyc2[(0, 0)][inner].astype(float) - cyc1[(0, 0)][inner]) ** 2)
        after = np.mean((reg_plane[inner].astype(float) - cyc1[(0, 0)][inner]) ** 2)
        assert after < before * 0.05, f"before={before} after={after}"

        # CSV artifact
        with open(out_dir / "feature_reg_parameters.csv") as fh:
            rows = list(csv.DictReader(fh))
        assert [r["name"] for r in rows] == ["Cycle 1", "Cycle 2"]
        assert abs(float(rows[1]["2"]) + 7.0) < 0.5  # tx ~ -7
        assert abs(float(rows[1]["5"]) - 4.0) < 0.5  # ty ~ +4


class TestOptFlowPipeline:
    def test_e2e_chained(self, synthetic_dataset, tmp_path):
        ds_dir, cyc1, cyc2, fwd = synthetic_dataset
        out_dir = tmp_path / "out_of"
        cfg_path = tmp_path / "c2.yaml"
        cfg_path.write_text(yaml.dump(_config(ds_dir, out_dir, feature=True, optflow=True), sort_keys=False))
        cfg = PipelineConfigReader().read_config(cfg_path)
        run_pipeline(cfg)
        out = out_dir / "test_optflow_reg_result_stack.tif"
        assert out.exists()
        with TiffFile(out) as tf:
            reg_plane = tf.read_page(4)
        inner = (slice(30, -30), slice(30, -30))
        before = np.mean((cyc2[(0, 0)][inner].astype(float) - cyc1[(0, 0)][inner]) ** 2)
        after = np.mean((reg_plane[inner].astype(float) - cyc1[(0, 0)][inner]) ** 2)
        assert after < before * 0.05
