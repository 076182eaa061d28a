"""Auto-FeatureReg fallback: optflow-only inputs with mismatched dims
(reference __main__.py:560-574)."""

import cv2 as cv
import numpy as np
import yaml

from microaligner_tpu.io import MemmapWriter, TiffFile
from microaligner_tpu.pipeline.config import PipelineConfigReader
from microaligner_tpu.pipeline.runner import run_pipeline


def _ome(nc, nz, h, w, channels):
    chs = "".join(
        f'<Channel ID="Channel:0:{i}" Name="{n}" SamplesPerPixel="1"/>'
        for i, n in enumerate(channels)
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06"><Image ID="Image:0" Name="t">'
        f'<Pixels ID="Pixels:0" DimensionOrder="XYZCT" Type="uint16" SizeT="1" SizeC="{nc}" SizeZ="{nz}" '
        f'SizeY="{h}" SizeX="{w}" PhysicalSizeX="0.5" PhysicalSizeXUnit="um" '
        'PhysicalSizeY="0.5" PhysicalSizeYUnit="um">' + chs + "</Pixels></Image></OME>"
    )


def test_optflow_only_mismatched_dims_triggers_featurereg(tmp_path, capsys):
    rng = np.random.default_rng(3)
    big = cv.normalize(cv.GaussianBlur(rng.random((240, 250), dtype=np.float32), (0, 0), 2.0),
                       None, 0, 50000, cv.NORM_MINMAX, cv.CV_16U)
    small = big[:220, :230].copy()  # cycle 2 cropped -> dims mismatch

    for name, img in [("c1.ome.tif", big), ("c2.ome.tif", small)]:
        h, w = img.shape
        mm = MemmapWriter(tmp_path / name, (1, 1, 1, h, w), np.uint16,
                          description=_ome(1, 1, h, w, ("DAPI",)))
        mm[0, 0, 0] = img
        mm.close()

    cfg = {
        "Input": {"InputImagePaths": {"Cycle 1": str(tmp_path / "c1.ome.tif"),
                                       "Cycle 2": str(tmp_path / "c2.ome.tif")},
                  "ReferenceCycle": 1, "ReferenceChannel": "DAPI"},
        "Output": {"OutputDir": str(tmp_path / "out"), "OutputPrefix": "",
                   "SaveOutputToCycleStack": True},
        "RegistrationParameters": {
            "OptFlowReg": dict(NumberPyramidLevels=1, NumberIterationsPerLevel=2,
                               TileSize=300, Overlap=50, NumberOfWorkers=0,
                               UseFullResImage=True, UseDOG=False),
        },
    }
    p = tmp_path / "c.yaml"
    p.write_text(yaml.dump(cfg, sort_keys=False))
    run_pipeline(PipelineConfigReader().read_config(p))

    captured = capsys.readouterr().out
    assert "Will try to perform FeatureReg first" in captured
    # both stages produced outputs; optflow output matches the target shape
    assert (tmp_path / "out" / "feature_reg_result_stack.tif").exists()
    of = tmp_path / "out" / "optflow_reg_result_stack.tif"
    assert of.exists()
    with TiffFile(of) as tf:
        assert tf.pages[0].length == 240 and tf.pages[0].width == 250
        assert len(tf.pages) == 2
