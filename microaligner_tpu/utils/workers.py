"""Worker-count configuration — reference API compat.

The reference's ``set_number_of_dask_workers`` (shared_modules/utils.py:
117-123) sized a local process pool.  Here tile parallelism maps onto the
TPU device mesh, so the knob only bounds how many devices the mesh uses
(0 = all).  Kept so pipeline configs and library callers keep working.
"""

from __future__ import annotations

import jax

__all__ = ["set_number_of_workers", "get_worker_devices"]

_max_devices: int = 0  # 0 = all


def set_number_of_workers(n_workers: int = 0):
    """0 -> use every local device; n -> cap the mesh at n devices."""
    global _max_devices
    if n_workers < 0:
        raise ValueError("Number of workers cannot be negative")
    _max_devices = int(n_workers)


# reference-named alias
set_number_of_dask_workers = set_number_of_workers


def get_worker_devices():
    devices = jax.devices()
    if _max_devices > 0:
        devices = devices[: _max_devices]
    return devices
