"""Pipeline layer: YAML config, dataset structure resolution, orchestration."""

from microaligner_tpu.pipeline.config import PipelineConfig, PipelineConfigReader
from microaligner_tpu.pipeline.dataset import DatasetStruct, DatasetStructCreator

__all__ = ["PipelineConfig", "PipelineConfigReader", "DatasetStruct", "DatasetStructCreator"]
