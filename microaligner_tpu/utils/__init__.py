"""Host-side helpers: validation, dtype aliases, page reading, worker config.

Mirrors the reference's shared_modules surface (shared_modules/__init__.py).
"""

from microaligner_tpu.utils.img_checks import (
    check_img_dims_match,
    check_img_is_2d_grey,
    check_img_is_provided,
    check_input_has_proper_dimensions,
    check_number_of_input_img_paths,
)
from microaligner_tpu.utils.pages import read_and_max_project_pages
from microaligner_tpu.utils.workers import (
    get_worker_devices,
    set_number_of_dask_workers,
    set_number_of_workers,
)

__all__ = [
    "check_img_dims_match",
    "check_img_is_2d_grey",
    "check_img_is_provided",
    "check_input_has_proper_dimensions",
    "check_number_of_input_img_paths",
    "read_and_max_project_pages",
    "set_number_of_workers",
    "set_number_of_dask_workers",
    "get_worker_devices",
]
