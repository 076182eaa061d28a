"""Run a compile-and-compare self-test outside any ambient JAX trace.

The Pallas availability gates fire lazily — often in the middle of tracing a
production jit (the kernel choice is a trace-time decision).  JAX's trace
state is thread-local, so running the self-test on a fresh thread gives it a
clean eager context; wrapping it in ``ensure_compile_time_eval`` instead
breaks Pallas's own kernel tracing.
"""

from __future__ import annotations

import threading
from typing import Callable

__all__ = ["run_outside_trace"]


def run_outside_trace(fn: Callable[[], bool]) -> bool:
    """Execute ``fn`` on a fresh thread (clean trace state); False on error."""
    result: dict[str, bool] = {}

    def runner() -> None:
        try:
            result["ok"] = bool(fn())
        except Exception:
            result["ok"] = False

    t = threading.Thread(target=runner, daemon=True)
    t.start()
    t.join()
    return result.get("ok", False)
