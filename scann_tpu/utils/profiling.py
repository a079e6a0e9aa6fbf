"""Profiling and timing utilities.

The reference has no tracing/profiling at all (SURVEY.md §5.1 — only a
wall-clock print around training). Here:

- ``trace(logdir)``: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace (xplane) of device + host activity,
- ``Timer``: lightweight named wall-clock accumulator for pipeline stages,
- per-epoch throughput (structures/sec) is recorded by the Trainer into
  ``metrics.jsonl`` already; these tools are for deeper dives.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace into ``logdir``.

    View with TensorBoard (``tensorboard --logdir <logdir>``) or xprof.
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating wall-clock timer: ``with timer("pack"): ...``."""

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

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name}: {t:.3f}s total, {c} calls, {t / c * 1e3:.2f} ms/call")
        return "\n".join(lines)
