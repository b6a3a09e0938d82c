"""Profiling hooks: XLA trace capture + throughput counters.

The reference has no formal profiler (SURVEY.md §5) — only wall-clock
prints. The TPU rebuild adds: a ``jax.profiler`` trace context whose
output loads in TensorBoard/XProf (kernel timeline, HBM usage), and a
throughput accumulator producing the per-block Mvox/s counters that the
detection pipeline logs.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Iterator, Optional

_logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mmtpu_trace") -> Iterator[None]:
    """Capture an XLA profiler trace viewable in TensorBoard.

    Usage::

        with profiler.trace("/tmp/trace"):
            detect_blobs_stack(...)
    """
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        _logger.info("profiler trace written to %s", log_dir)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the profiler timeline (TraceAnnotation)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


class Throughput:
    """Accumulates voxels/sec across pipeline steps (the per-block
    Mvox/s counter used by the detection pipeline)."""

    def __init__(self):
        self.voxels = 0
        self.seconds = 0.0
        self.blocks = 0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, n_voxels: int) -> float:
        """Close a timed region; returns this block's Mvox/s."""
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.voxels += int(n_voxels)
        self.seconds += dt
        self.blocks += 1
        self._t0 = None
        return n_voxels / dt / 1e6 if dt else float("inf")

    @property
    def mvox_per_s(self) -> float:
        return self.voxels / self.seconds / 1e6 if self.seconds else 0.0

    def summary(self) -> Dict[str, float]:
        return {"blocks": self.blocks, "voxels": self.voxels,
                "seconds": round(self.seconds, 3),
                "mvox_per_s": round(self.mvox_per_s, 2)}
