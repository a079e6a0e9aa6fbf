"""Profiling tooling (SURVEY.md §5.1): the reference has none; ours must
actually produce artifacts.

``jax.profiler.trace`` is verified to hang over the axon TPU tunnel
(NEXT.md), so the trace-capture path is pinned here on the CPU backend —
the capture machinery (start/stop, xplane serialization, logdir layout) is
backend-independent; only the device timeline source differs. On-device
timing is covered by tools/step_breakdown.py instead.
"""

import glob
import os

import jax
import jax.numpy as jnp

from scann_tpu.utils.profiling import Timer, trace


def test_trace_captures_xplane(tmp_path):
    # the profiler serializes metadata for EVERY live compiled executable;
    # late in the suite (cross-test jit caches) that inflates this test from
    # <1 s to ~50 s — drop accumulated executables first, we only need f
    jax.clear_caches()
    logdir = str(tmp_path / "trace")

    @jax.jit
    def f(x):
        return (x @ x).sum()

    x = jnp.ones((64, 64))
    float(f(x))  # compile outside the trace window
    with trace(logdir):
        float(f(x))

    # TensorBoard/xprof layout: <logdir>/plugins/profile/<run>/*.xplane.pb
    captured = glob.glob(
        os.path.join(logdir, "plugins", "profile", "*", "*.xplane.pb"))
    assert captured, f"no xplane trace written under {logdir}"
    assert os.path.getsize(captured[0]) > 0


def test_timer_accumulates_and_reports():
    t = Timer()
    with t("stage_a"):
        pass
    with t("stage_a"):
        pass
    with t("stage_b"):
        pass
    assert t.counts["stage_a"] == 2 and t.counts["stage_b"] == 1
    s = t.summary()
    assert "stage_a" in s and "2 calls" in s
