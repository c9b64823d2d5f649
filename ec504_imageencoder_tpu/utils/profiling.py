"""Tracing / profiling helpers.

The reference's only introspection is printf in hot loops (SURVEY.md §5).
Here: xprof-compatible device traces via jax.profiler, plus lightweight
named scopes the pipelines annotate so stages are attributable in the
trace viewer.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace (open with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def stage_scope(name: str):
    """Named scope for pipeline stages; no-op outside tracing."""
    import jax

    return jax.named_scope(name)


class WallTimer:
    """Accumulating wall-clock stage timer for host-side reporting."""

    def __init__(self) -> None:
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> dict[str, float]:
        return dict(self.times)
