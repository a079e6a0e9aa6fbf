"""Profiling tooling (SURVEY.md §5.1): the reference has none; ours must
actually produce artifacts.

The trace-capture path is pinned here on the CPU backend — the capture
machinery (start/stop, xplane serialization, logdir layout) and the
Chrome-trace device-lane parser (tools/capture_trace.py) are
backend-independent; only the device timeline source differs. Real
on-device traces are captured by ``tools/capture_trace.py`` (verified
working over the axon tunnel late round 3; summaries + kept traces live
under benchmarks/), wall-clock component timing by
``tools/step_breakdown.py``.
"""

import glob
import gzip
import json
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


def test_parse_device_trace_lanes(tmp_path):
    """The Chrome-trace parser attributes X events to the right device
    lanes: op time from "XLA Ops", module (executable) spans + busy window
    from "XLA Modules", host events ignored."""
    from tools.capture_trace import parse_device_trace

    events = [
        # lane metadata
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 1, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 701, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 701, "tid": 9, "name": "thread_name",
         "args": {"name": "python"}},
        # two module executions: [100, 400) and [600, 900) us
        {"ph": "X", "pid": 3, "tid": 1, "name": "jit_epoch", "ts": 100,
         "dur": 300},
        {"ph": "X", "pid": 3, "tid": 1, "name": "jit_epoch", "ts": 600,
         "dur": 300},
        # ops inside them
        {"ph": "X", "pid": 3, "tid": 2, "name": "fusion.1", "ts": 110,
         "dur": 200},
        {"ph": "X", "pid": 3, "tid": 2, "name": "custom-call", "ts": 610,
         "dur": 250},
        # host noise that must NOT count
        {"ph": "X", "pid": 701, "tid": 9, "name": "PjitFunction", "ts": 0,
         "dur": 10000},
    ]
    run = tmp_path / "plugins" / "profile" / "2026_01_01"
    os.makedirs(run)
    with gzip.open(run / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    s = parse_device_trace(str(tmp_path))
    assert s["device_module_time_us"] == 600.0
    assert s["device_op_time_us"] == 450.0
    # window spans first module start to last module end: 800 us
    assert s["device_window_us"] == 800.0
    assert s["device_busy_fraction"] == round(600.0 / 800.0, 4)
    assert s["modules"] == {"jit_epoch": 600.0}
    assert list(s["top_ops_us"]) == ["custom-call", "fusion.1"]


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
