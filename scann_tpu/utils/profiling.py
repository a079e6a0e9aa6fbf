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
def trace(logdir: str, python_tracer: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace into ``logdir``.

    View with TensorBoard (``tensorboard --logdir <logdir>``) or xprof.

    ``python_tracer=False`` drops per-Python-call host events. Use it for
    long windows: the Chrome-trace export caps at ~1e6 events, and a busy
    host (e.g. value fetches that busy-wait over the axon tunnel) floods
    the cap with nested Python frames, truncating the DEVICE lanes
    (observed on the packed-epoch capture, tools/capture_trace.py).
    """
    import jax

    # ProfileOptions / the profiler_options kwarg only exist in newer jax
    # releases; on older versions fall back to a plain start_trace (the
    # python tracer stays on — only long tunnel-bound windows need it off).
    if hasattr(jax.profiler, "ProfileOptions"):
        opts = jax.profiler.ProfileOptions()
        if not python_tracer:
            opts.python_tracer_level = 0
        jax.profiler.start_trace(logdir, profiler_options=opts)
    else:
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
