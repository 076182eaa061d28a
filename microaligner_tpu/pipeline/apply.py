"""Streamed transform application: overlap TIFF I/O with device compute.

The apply phase warps every channel/z-plane with the cycle's transform and
writes BigTIFF planes.  JAX dispatch is asynchronous, so a small pipeline
keeps the device busy: submit the warp for plane i+1 before fetching plane i,
and hand finished planes to a writer thread (BASELINE.md config #5's
"streamed tile I/O overlapped with device compute").
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Tuple

import jax
import numpy as np

__all__ = ["stream_apply"]


def stream_apply(
    planes: Iterable[Tuple[object, np.ndarray]],
    device_fn: Callable[[np.ndarray], jax.Array],
    write_fn: Callable[[object, np.ndarray], None],
    depth: int = 2,
):
    """For each ``(key, plane)``: write ``device_fn(plane)`` via ``write_fn``.

    ``device_fn`` must be an async-dispatching JAX call; up to ``depth``
    results stay in flight while the next plane is read and the previous one
    is written on a background thread.
    """
    wq: "queue.Queue" = queue.Queue(maxsize=depth)
    errors = []

    def writer():
        while True:
            item = wq.get()
            if item is None:
                return
            key, dev = item
            try:
                write_fn(key, np.asarray(jax.device_get(dev)))
            except Exception as e:  # propagate to the caller
                errors.append(e)
                return

    wt = threading.Thread(target=writer, daemon=True)
    wt.start()
    try:
        for key, plane in planes:
            out = device_fn(plane)  # async dispatch
            # bounded put that keeps checking for writer death — a plain
            # blocking put deadlocks if the writer exits with a full queue
            while True:
                if errors:
                    raise errors[0]
                try:
                    wq.put((key, out), timeout=0.5)
                    break
                except queue.Full:
                    continue
    finally:
        if not errors:
            wq.put(None)
        wt.join(timeout=600)
    if errors:
        raise errors[0]
