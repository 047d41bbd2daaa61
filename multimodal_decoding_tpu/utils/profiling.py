"""Tracing & profiling helpers.

The reference instruments its two hot fits with bare ``time.time()`` brackets
(ridge_regression_decoding.py:122-125, searchlight.py:250-257).  Here the
same boundaries get structured timers plus optional ``jax.profiler`` traces,
and the searchlight reports vertices/sec (the BASELINE.json metric).
"""

from __future__ import annotations

import contextlib
import time


class StageTimer:
    """Collects named wall-clock stages; printable summary."""

    def __init__(self):
        self.stages: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + (time.time() - t0)

    def report(self) -> str:
        total = sum(self.stages.values())
        lines = [f"{k}: {v:.2f}s ({100 * v / max(total, 1e-9):.0f}%)" for k, v in self.stages.items()]
        return " | ".join(lines) + f" | total {total:.2f}s"


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """jax.profiler trace around a block (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
