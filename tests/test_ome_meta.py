"""OME-XML output-metadata modes (create_new_meta's four topologies)."""

import numpy as np
import pytest

from microaligner_tpu.io.ome import (
    collect_info_from_ome,
    convert_to_nm,
    create_new_meta,
    extract_pixels_info,
    str_to_xml,
    strip_cycle_info,
)


def _xml(size_c=2, channels=("DAPI", "Cy5"), size_z=1, h=50, w=60):
    chs = "".join(
        f'<Channel ID="Channel:0:{i}" Name="{n}" SamplesPerPixel="1"/>'
        for i, n in enumerate(channels)
    )
    return str_to_xml(
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06"><Image ID="Image:0" Name="t">'
        f'<Pixels ID="Pixels:0" DimensionOrder="XYZCT" Type="uint16" SizeT="1" SizeC="{size_c}" '
        f'SizeZ="{size_z}" SizeY="{h}" SizeX="{w}" '
        'PhysicalSizeX="0.25" PhysicalSizeXUnit="um" PhysicalSizeY="0.25" PhysicalSizeYUnit="um">'
        + chs + "</Pixels></Image></OME>"
    )


class TestHelpers:
    def test_strip_cycle_info(self):
        assert strip_cycle_info("c02 DAPI") == "DAPI"
        assert strip_cycle_info("cyc12_GFP-3") == "GFP"
        assert strip_cycle_info("cycle3-Cy5_2") == "Cy5"
        assert strip_cycle_info("DAPI") == "DAPI"

    def test_unit_conversion(self):
        assert convert_to_nm(1.0, "um") == 1000.0
        assert convert_to_nm(2.0, "mm") == 2e6
        assert convert_to_nm(5.0, "nm") == 5.0
        with pytest.raises(ValueError):
            convert_to_nm(1.0, "parsec")


class TestCreateNewMeta:
    def test_passthrough_stack_to_stack(self):
        metas = {1: _xml(), 2: _xml()}
        out = create_new_meta(metas, (50, 60), input_is_stack=True, output_is_stack=True)
        assert set(out) == {1, 2}
        assert 'SizeC="2"' in out[1]

    def test_combined(self):
        metas = {1: _xml(), 2: _xml()}
        out = create_new_meta(metas, (70, 80), input_is_stack=False, output_is_stack=True)
        # all cycles share one combined doc: summed channels, cycle prefixes
        assert out[1] == out[2]
        info = extract_pixels_info(str_to_xml(out[1]))
        assert info["SizeC"] == 4
        assert info["SizeY"] == 70 and info["SizeX"] == 80
        assert info["PhysicalSizeXUnit"] == "nm"
        assert info["PhysicalSizeX"] == 250.0
        assert "c01 DAPI" in out[1] and "c02 Cy5" in out[1]
        # ref channel still resolvable through the prefixes
        assert collect_info_from_ome("DAPI", str_to_xml(out[1]))["ref_ch_ids"] == [0, 2]

    def test_split_stack(self):
        stack = _xml(size_c=4, channels=("c01 DAPI", "c01 Cy5", "c02 DAPI", "c02 Cy5"))
        metas = {1: stack, 2: stack}
        out = create_new_meta(metas, (50, 60), input_is_stack=True, output_is_stack=False)
        x1 = str_to_xml(out[1])
        assert extract_pixels_info(x1)["SizeC"] == 2
        assert "c01 DAPI" in out[1] and "c02 DAPI" not in out[1]
        assert "c02 DAPI" in out[2]

    def test_per_image(self):
        metas = {1: _xml(), 2: _xml()}
        out = create_new_meta(metas, (90, 100), input_is_stack=False, output_is_stack=False)
        for cyc in (1, 2):
            info = extract_pixels_info(str_to_xml(out[cyc]))
            assert info["SizeC"] == 2
            assert info["SizeY"] == 90
        # TiffData IFD nodes rebuilt
        assert 'IFD="0"' in out[1] and 'PlaneCount="1"' in out[1]
