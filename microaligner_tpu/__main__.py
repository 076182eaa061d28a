"""CLI entry point: ``python -m microaligner_tpu config.yaml``.

Mirrors the reference console script (reference __main__.py:440-447,624-642):
one positional argument — the YAML config path.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from pprint import pprint

from microaligner_tpu.pipeline.config import PipelineConfigReader
from microaligner_tpu.pipeline.runner import run_pipeline


def parse_cmd_args() -> Path:
    parser = argparse.ArgumentParser(
        description="microaligner_tpu: TPU-native image registration for large scale microscopy"
    )
    parser.add_argument("config", type=Path, help="path to the config yaml file")
    return parser.parse_args().config


def main():
    print("Started\n")
    config_path = parse_cmd_args()
    config = PipelineConfigReader().read_config(config_path)
    print("The input config is:")
    pprint(config, sort_dicts=False, indent=2)
    run_pipeline(config)


if __name__ == "__main__":
    main()
