"""Step telemetry: timers, progress callbacks, and jax.profiler traces.

The reference logs each step/substep with process + wall time and pushes
percent-complete to the GUI via a lock-guarded callback (ProgressRedraw,
tilingencoder.pas:3904-3979). The TPU equivalent is a structured step
timer plus optional XLA profiler traces (`TILER_TPU_PROFILE=dir`)."""
from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Dict, Optional


class StepTimer:
    """Accumulates named step timings; optionally reports progress."""

    def __init__(self, log: Optional[Callable[[str], None]] = None,
                 on_progress: Optional[Callable[[str, float], None]] = None):
        self.timings: Dict[str, float] = {}
        self.log = log
        self.on_progress = on_progress
        self._t0 = time.monotonic()

    @contextlib.contextmanager
    def step(self, name: str):
        t = time.monotonic()
        if self.on_progress:
            self.on_progress(name, 0.0)
        try:
            yield
        finally:
            dt = time.monotonic() - t
            self.timings[name] = self.timings.get(name, 0.0) + dt
            if self.log:
                self.log(f"[{name}] {dt:.3f}s (cumulative {time.monotonic()-self._t0:.1f}s)")
            if self.on_progress:
                self.on_progress(name, 1.0)

    def report(self) -> str:
        total = sum(self.timings.values())
        lines = [f"{k:20s} {v:8.3f}s {100*v/max(total,1e-9):5.1f}%" for k, v in self.timings.items()]
        lines.append(f"{'total':20s} {total:8.3f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def trace_step(name: str):
    """Wrap a step in a jax.profiler trace when TILER_TPU_PROFILE is set
    (point a TensorBoard at the directory to inspect XLA timelines)."""
    prof_dir = os.environ.get("TILER_TPU_PROFILE")
    if not prof_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(prof_dir, name)):
        yield
