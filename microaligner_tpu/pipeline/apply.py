"""Streamed transform application: overlap TIFF I/O with device compute.

The apply phase warps every channel/z-plane with the cycle's transform and
writes BigTIFF planes.  JAX dispatch is asynchronous, so a small pipeline
keeps the device busy on both sides (BASELINE.md config #5's "streamed tile
I/O overlapped with device compute"):

* input side — a reader thread pulls planes from the (possibly lazy,
  TIFF-decoding) iterable and issues the async host->device ``device_put``,
  so decode + H2D for plane i+1 overlap the device warp of plane i;
* output side — up to ``depth`` warp results stay in flight while a writer
  thread fetches finished planes and hands them to ``write_fn``.

Both worker threads propagate failures to the caller; a writer that is still
alive after the join timeout (dead NFS mount, hung filesystem) raises rather
than silently returning with planes unwritten.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Tuple

import jax
import numpy as np

__all__ = ["stream_apply"]

_STOP = object()


def _checked_put(q: "queue.Queue", item, failed: Callable[[], bool]):
    """Bounded put that keeps checking the peer thread — a plain blocking put
    deadlocks if the consumer exits with a full queue."""
    while True:
        if failed():
            return False
        try:
            q.put(item, timeout=0.5)
            return True
        except queue.Full:
            continue


def stream_apply(
    planes: Iterable[Tuple[object, np.ndarray]],
    device_fn: Callable[[np.ndarray], jax.Array],
    write_fn: Callable[[object, np.ndarray], None],
    depth: int = 2,
    prefetch: int = 2,
    join_timeout_s: float | None = None,
):
    """For each ``(key, plane)``: write ``device_fn(plane)`` via ``write_fn``.

    ``device_fn`` must be an async-dispatching JAX call; up to ``depth``
    results stay in flight while the reader thread decodes + ``device_put``\\ s
    the next ``prefetch`` planes and the writer thread drains finished ones.
    """
    if join_timeout_s is None:
        import os

        join_timeout_s = float(
            os.environ.get("MICROALIGNER_TPU_WRITER_TIMEOUT_S", "600")
        )
    rq: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch))
    wq: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    read_errors: list = []
    write_errors: list = []
    done = threading.Event()

    def reader():
        try:
            for key, plane in planes:
                arr = jax.device_put(plane)  # async H2D, overlaps compute
                if not _checked_put(rq, (key, arr), done.is_set):
                    return
        except Exception as e:  # decode/H2D failure -> caller
            read_errors.append(e)
        finally:
            _checked_put(rq, _STOP, done.is_set)

    import time as _time

    progress = [_time.monotonic()]  # last time the writer completed an item

    def writer():
        while True:
            item = wq.get()
            if item is _STOP:
                return
            key, dev = item
            try:
                progress[0] = _time.monotonic()  # starting an item is progress
                write_fn(key, np.asarray(jax.device_get(dev)))
                progress[0] = _time.monotonic()
            except Exception as e:  # propagate to the caller
                write_errors.append(e)
                return

    rt = threading.Thread(target=reader, daemon=True, name="stream_apply_reader")
    wt = threading.Thread(target=writer, daemon=True, name="stream_apply_writer")
    rt.start()
    wt.start()
    try:
        while True:
            item = rq.get()
            if item is _STOP:
                break
            key, plane = item
            out = device_fn(plane)  # async dispatch
            if not _checked_put(wq, (key, out), lambda: bool(write_errors)):
                break
    finally:
        done.set()  # unblocks a reader stuck on a full rq
        if not write_errors:
            wq.put(_STOP)
        # Join in slices and only give up when the writer has made NO progress
        # for ``join_timeout_s`` — a big plane crossing a slow link is "slow",
        # a dead NFS mount is "hung"; a fixed-length join can't tell them
        # apart (it fired on an 800 MB device_get over the dev tunnel).
        while True:
            wt.join(timeout=min(30.0, join_timeout_s))
            if not wt.is_alive():
                break
            if _time.monotonic() - progress[0] > join_timeout_s:
                break
        rt.join(timeout=join_timeout_s)
    if write_errors:
        raise write_errors[0]
    if read_errors:
        raise read_errors[0]
    if wt.is_alive():
        raise RuntimeError(
            f"stream_apply: writer thread made no progress for {join_timeout_s}s "
            "— output sink appears hung; planes may be unwritten"
        )
