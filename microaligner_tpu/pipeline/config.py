"""YAML pipeline configuration with the reference's exact schema.

Schema, field names, dtype checks, bounds, and input-topology inference all
match config_reader.py (reference): three input layouts (``CycleStack`` /
``CycleBuilder`` / ``CyclePerImage``), bounds NumberPyramidLevels 0..8,
NumberIterationsPerLevel >=1, TileSize >=20, Overlap 10..TileSize,
NumberOfWorkers >=0 (accepted for config compatibility; tile parallelism maps
to the device mesh instead of a worker pool).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, Iterable, Optional, Union

import yaml

__all__ = ["PipelineConfig", "PipelineConfigReader", "RegParam"]

FloatInt = Union[float, int]


def read_yaml(path) -> dict:
    with open(path, "r", encoding="utf-8") as s:
        return yaml.safe_load(s)


def check_field_dtype(field_name: str, dtype, obj: dict):
    dtypes = dtype if isinstance(dtype, tuple) else (dtype,)
    if field_name not in obj:
        raise KeyError(f"config is missing required field '{field_name}'")
    if not any(isinstance(obj[field_name], d) for d in dtypes):
        raise TypeError(
            f"config field '{field_name}': got {type(obj[field_name]).__name__}, "
            f"expected one of {[d.__name__ for d in dtypes]}"
        )


def check_field_min_max(field_name: str, _min: Optional[FloatInt], _max: Optional[FloatInt], obj: dict):
    if field_name not in obj:
        raise KeyError(f"config is missing required field '{field_name}'")
    val = obj[field_name]
    if isinstance(val, (int, float)):
        if _min is not None and val < _min:
            raise ValueError(f"config field '{field_name}'={val} is below the minimum of {_min}")
        if _max is not None and val > _max:
            raise ValueError(f"config field '{field_name}'={val} is above the maximum of {_max}")


class RegParam:
    NumberPyramidLevels: int
    NumberIterationsPerLevel: int
    TileSize: int
    Overlap: int
    NumberOfWorkers: int
    UseFullResImage: bool
    UseDOG: bool

    def read_from_dict(self, d: dict):
        check_field_dtype("NumberPyramidLevels", int, d)
        check_field_dtype("NumberIterationsPerLevel", int, d)
        check_field_dtype("TileSize", int, d)
        check_field_dtype("Overlap", int, d)
        check_field_dtype("NumberOfWorkers", int, d)
        check_field_dtype("UseFullResImage", bool, d)
        check_field_dtype("UseDOG", bool, d)
        check_field_min_max("NumberPyramidLevels", 0, 8, d)
        check_field_min_max("NumberIterationsPerLevel", 1, None, d)
        check_field_min_max("TileSize", 20, None, d)
        check_field_min_max("Overlap", 10, d["TileSize"], d)
        check_field_min_max("NumberOfWorkers", 0, None, d)
        for k in ("NumberPyramidLevels", "NumberIterationsPerLevel", "TileSize",
                  "Overlap", "NumberOfWorkers", "UseFullResImage", "UseDOG"):
            setattr(self, k, d[k])

    def __repr__(self):
        return str(self.__dict__)


class PipelineInput:
    InputImagePaths: dict
    ReferenceCycle: int
    ReferenceChannel: str
    PipelineInputType: str

    def __repr__(self):
        return str(self.__dict__)


class PipelineOutput:
    OutputDir: Path
    OutputPrefix: str
    SaveOutputToCycleStack: bool

    def __repr__(self):
        return str(self.__dict__)


class PipelineRegParam:
    FeatureReg: Optional[RegParam]
    OptFlowReg: Optional[RegParam]

    def __init__(self):
        self.FeatureReg = RegParam()
        self.OptFlowReg = RegParam()

    def __repr__(self):
        return f"FeatureReg: {self.FeatureReg}, OptFlowReg: {self.OptFlowReg}"


class PipelineConfig:
    def __init__(self):
        self.Input = PipelineInput()
        self.Output = PipelineOutput()
        self.RegistrationParameters = PipelineRegParam()

    def __repr__(self):
        return str(self.__dict__)


class PipelineConfigReader:
    """Reads and validates the pipeline YAML (reference config_reader.py:149-304)."""

    def read_config(self, config_path) -> PipelineConfig:
        config = read_yaml(config_path)
        missing = [f for f in ("Input", "Output", "RegistrationParameters") if f not in config]
        if missing:
            raise ValueError(
                f"config file lacks required top-level sections: {missing}"
            )
        pc = PipelineConfig()
        self._parse_input(config["Input"], pc.Input)
        self._parse_output(config["Output"], pc.Output)
        self._parse_reg_param(config["RegistrationParameters"], pc.RegistrationParameters)
        return pc

    def _parse_input(self, input_dict: dict, out: PipelineInput):
        if not isinstance(input_dict, dict):
            raise ValueError("the Input section must be a mapping")
        check_field_dtype("InputImagePaths", (dict, list), input_dict)
        check_field_dtype("ReferenceCycle", int, input_dict)
        check_field_dtype("ReferenceChannel", str, input_dict)
        check_field_min_max("ReferenceCycle", 1, None, input_dict)

        path_dict = input_dict["InputImagePaths"]
        path_dict_type = self.get_path_dict_type(path_dict)
        out.InputImagePaths = self.parse_path_dict(path_dict, path_dict_type)
        out.ReferenceCycle = input_dict["ReferenceCycle"]
        out.ReferenceChannel = input_dict["ReferenceChannel"]
        out.PipelineInputType = path_dict_type

    @staticmethod
    def parse_path_dict(path_dict: dict, path_dict_type: str) -> Dict:
        proc: Dict = {}
        cyc_pat = re.compile(r"Cycle \d+")
        if path_dict_type == "CycleBuilder":
            for cyc_name, chans in path_dict.items():
                if not cyc_pat.match(cyc_name):
                    raise ValueError(f"bad cycle key {cyc_name!r}: expected the form 'Cycle <number>'")
                cyc_id = int(re.search(r"(\d+)", cyc_name).groups()[0])
                ch_list = list(chans.keys())
                if len(ch_list) > len(set(ch_list)):
                    raise ValueError(f"duplicate channel names under Cycle {cyc_id}: {ch_list}")
                proc[cyc_id] = {ch: Path(p) for ch, p in chans.items()}
        elif path_dict_type == "CycleStack":
            proc[0] = Path(path_dict["CycleStack"])
        else:
            for cyc_name, p in path_dict.items():
                if not cyc_pat.match(cyc_name):
                    raise ValueError(f"bad cycle key {cyc_name!r}: expected the form 'Cycle <number>'")
                cyc_id = int(re.search(r"(\d+)", cyc_name).groups()[0])
                proc[cyc_id] = Path(p)
        return proc

    def _parse_output(self, output_dict: dict, out: PipelineOutput):
        check_field_dtype("OutputDir", str, output_dict)
        check_field_dtype("OutputPrefix", str, output_dict)
        check_field_dtype("SaveOutputToCycleStack", bool, output_dict)
        out.OutputDir = Path(output_dict["OutputDir"])
        out.OutputPrefix = output_dict["OutputPrefix"]
        out.SaveOutputToCycleStack = output_dict["SaveOutputToCycleStack"]

    def _parse_reg_param(self, reg_dict: dict, out: PipelineRegParam):
        if "FeatureReg" not in reg_dict and "OptFlowReg" not in reg_dict:
            raise ValueError(
                "RegistrationParameters must define FeatureReg, OptFlowReg, or both"
            )
        if "FeatureReg" in reg_dict:
            check_field_dtype("FeatureReg", dict, reg_dict)
            out.FeatureReg.read_from_dict(reg_dict["FeatureReg"])
        else:
            out.FeatureReg = None
        if "OptFlowReg" in reg_dict:
            check_field_dtype("OptFlowReg", dict, reg_dict)
            out.OptFlowReg.read_from_dict(reg_dict["OptFlowReg"])
        else:
            out.OptFlowReg = None

    @staticmethod
    def get_path_dict_type(path_dict: dict) -> str:
        if "CycleStack" in path_dict:
            if len(path_dict) > 1:
                raise ValueError("a CycleStack input is a single stack file; remove the extra paths")
            return "CycleStack"
        num_dict = sum(isinstance(v, dict) for v in path_dict.values())
        num_str = sum(isinstance(v, str) for v in path_dict.values())
        if num_dict > 0 and num_str > 0:
            raise NotImplementedError("InputImagePaths mixes per-channel and per-cycle entries; pick one layout")
        if num_dict == 0 and num_str == 0:
            raise ValueError(
                "InputImagePaths matches none of the known layouts "
                "(CycleStack / CycleBuilder / CyclePerImage)"
            )
        if num_dict < 2 and num_str < 2:
            raise ValueError(
                "registration needs at least two cycles in InputImagePaths"
            )
        return "CycleBuilder" if num_dict > 0 else "CyclePerImage"
