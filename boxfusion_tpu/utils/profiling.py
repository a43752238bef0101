"""Tracing / profiling utilities.

Capability target + extension: the reference's only instrumentation is a
wall-clock FPS print (reference demo.py:84,363-366; SURVEY.md section 5).
This module adds what a production framework needs:

  * ``StageTimer``: cheap named wall-clock accumulators (used by the host
    pipeline's per-stage timings);
  * ``trace()``: a context manager around ``jax.profiler`` emitting a
    TensorBoard-compatible device trace (XLA op-level timeline on TPU);
  * ``annotate()``: TraceAnnotation wrapper so host stages show up inside
    the device trace.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StageTimer:
    """Accumulating named timers: `with timer("detect"): ...`."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: dict(
                total_s=round(self.totals[k], 4),
                calls=self.counts[k],
                mean_ms=round(1000 * self.totals[k] / max(self.counts[k], 1), 2),
            )
            for k in sorted(self.totals)
        }

    def report(self) -> str:
        rows = [
            f"  {k:<24} {v['total_s']:>8.3f}s  x{v['calls']:<5} "
            f"{v['mean_ms']:>8.2f} ms/call"
            for k, v in self.summary().items()
        ]
        return "stage timings:\n" + "\n".join(rows)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/boxfusion_trace") -> Iterator[str]:
    """Capture a jax.profiler device trace (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Host-side annotation that appears in the device trace timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)
