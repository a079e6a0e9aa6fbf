"""Capture and summarize a REAL on-device profiler trace of the training step.

Closes SURVEY.md §5.1 (the reference has no tracing at all; rounds 2-3
could not capture one here because ``jax.profiler.trace`` hung over the
axon TPU tunnel — re-verified WORKING 2026-08-19, round 3). This tool:

1. builds exactly the Trainer's step body for a benchmark case via
   ``tools/step_breakdown.build_case`` (QM9 fused kernels or MP2018 loop
   kernels inside the whole-epoch ``lax.scan``),
2. compiles/warms OUTSIDE the trace window, then records N epoch calls
   under ``jax.profiler.trace`` (xplane + Chrome trace.json),
3. parses the Chrome trace's device lanes ("XLA Ops" / "XLA Modules" on
   ``/device:TPU:*``) into a measured summary: device-busy time per step,
   top ops by device time, device busy fraction over the traced window,
   and a MEASURED MFU (analytic FLOPs / device-busy-time — the analytic
   model itself is validated against XLA cost_analysis in
   tests/test_flops.py),
4. writes the summary to ``benchmarks/trace_summary_<case>.json`` and
   copies the compressed Chrome trace beside it for inspection
   (``benchmarks/traces/<case>/``; the xplane.pb stays in the logdir —
   point TensorBoard/xprof at it for the full timeline).

Usage: python tools/capture_trace.py [qm9|mp2018] [--logdir DIR]
Bound it generously when running ad hoc (first compile 20-40 s; the
crystal loop kernel can take minutes under other tenants' load).
"""

import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TRACED_EPOCHS = 2


def parse_device_trace(logdir: str) -> dict:
    """Summarize the newest Chrome trace under ``logdir``.

    Returns device-lane totals: per-op device time ("XLA Ops" lane),
    executable spans ("XLA Modules" lane), and the busy fraction of the
    device over the window spanned by module executions. Durations in the
    Chrome trace are microseconds (displayTimeUnit is reported but both
    observed values, "ms" metadata with us-scale ts/dur, match the
    TensorBoard convention of microsecond X-event durations).
    """
    paths = sorted(glob.glob(
        os.path.join(logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    d = json.load(gzip.open(paths[-1]))

    proc, lane = {}, {}
    for e in d["traceEvents"]:
        if e.get("ph") != "M":
            continue
        if e["name"] == "process_name":
            proc[e["pid"]] = e["args"]["name"]
        elif e["name"] == "thread_name":
            lane[(e["pid"], e.get("tid"))] = e["args"]["name"]

    ops, modules = {}, {}
    window = [float("inf"), float("-inf")]
    for e in d["traceEvents"]:
        if e.get("ph") != "X":
            continue
        if not proc.get(e["pid"], "").startswith("/device:TPU"):
            continue
        name = lane.get((e["pid"], e.get("tid")), "")
        dur = float(e.get("dur", 0.0))
        if name == "XLA Ops":
            ops[e["name"]] = ops.get(e["name"], 0.0) + dur
        elif name == "XLA Modules":
            modules[e["name"]] = modules.get(e["name"], 0.0) + dur
            window[0] = min(window[0], float(e["ts"]))
            window[1] = max(window[1], float(e["ts"]) + dur)

    ops_busy_us = sum(ops.values())
    mod_busy_us = sum(modules.values())
    span_us = max(window[1] - window[0], 0.0)
    return {
        "trace_json": paths[-1],
        "device_op_time_us": round(ops_busy_us, 3),
        "device_module_time_us": round(mod_busy_us, 3),
        "device_window_us": round(span_us, 3),
        "device_busy_fraction": (
            round(mod_busy_us / span_us, 4) if span_us else None),
        "modules": {k: round(v, 3) for k, v in sorted(
            modules.items(), key=lambda kv: -kv[1])},
        "top_ops_us": {k: round(v, 3) for k, v in sorted(
            ops.items(), key=lambda kv: -kv[1])[:12]},
    }


def build_packed_case():
    """The PRODUCTION packed path (the flagship bench metric): the real
    ``Trainer._train_epoch`` body over synthetic QM9-spread PackedSlots,
    exactly as bench.py's packed case runs it (tpu.pack_preserve_batch slot
    batching: ~128 structures per optimizer step)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config, _synthetic_packed_slots
    from scann_tpu.train import Trainer
    from scann_tpu.train.schedules import make_cosine_lr
    from scann_tpu.utils.flops import train_flops_per_structure

    from scann_tpu.data.packing import packed_slot_batch

    pslots = _synthetic_packed_slots(n_structs=8192, capacity=32, N=16,
                                     max_segments=8, seed=0)
    slot_bs = packed_slot_batch(128, pslots.num_slots, pslots.num_structures)
    cfg = _flagship_config(batch_size=slot_bs)
    cfg.hyper.save_path = "/tmp/scann_tpu_trace_packed_run"
    cfg.hyper.scheduler = "cosine"

    trainer = Trainer(cfg)
    steps_per_epoch = pslots.num_slots // slot_bs
    trainer._lr_fn = make_cosine_lr(cfg.hyper.lr, cfg.hyper.min_lr,
                                    steps_per_epoch, 100)
    trainer._make_steps()
    trainer.init_state({k: v[:1] for k, v in pslots.inputs.items()}, seed=0)
    (bi, bt), = trainer._put_buckets([pslots], "trace")
    key = jax.random.PRNGKey(0)

    def epoch(state, e):
        return trainer._train_epoch(state, bi, bt, jax.random.fold_in(key, e),
                                    jnp.float32(0.0))

    # structures actually trained per epoch: whole slot-batches only
    frac = (steps_per_epoch * slot_bs) / pslots.num_slots
    return {
        "case": "qm9_packed", "B": slot_bs, "M": 32, "N": 16,
        "epoch": epoch, "state": trainer.state, "scan_steps": steps_per_epoch,
        "structures_per_epoch": round(pslots.num_structures * frac),
        "train_flops_per_step":
            train_flops_per_structure(cfg.model, 32, 16) * slot_bs,
    }


def main(case: str = "qm9", logdir: str = ""):
    import numpy as np

    from scann_tpu.utils.profiling import trace
    from tools.step_breakdown import PEAK_TFLOPS, build_case

    if logdir:
        # a user-supplied logdir may hold previous captures — never wipe it
        # (parse_device_trace picks the NEWEST trace, so stale ones are fine)
        os.makedirs(logdir, exist_ok=True)
    else:
        logdir = f"/tmp/scann_tpu_trace_{case}"
        shutil.rmtree(logdir, ignore_errors=True)

    c = build_packed_case() if case == "qm9_packed" else build_case(case)
    steps_per_epoch = c["scan_steps"]
    state = c["state"]
    if case == "qm9_packed":
        run = c["epoch"]
    else:
        ep, inputs, y = c["epoch"], c["inputs"], c["y"]
        run = lambda s, e: ep(s, inputs, y)

    # compile + warm outside the window so the trace holds steady-state
    # steps only (and fetch a VALUE — over the axon tunnel
    # block_until_ready can return early, DESIGN.md "Benchmarking pitfalls")
    def one_epoch(state, e):
        state, m = run(state, e)
        leaf = m["loss"] if isinstance(m, dict) else m[0]
        float(np.asarray(leaf).ravel()[0])
        return state

    import time

    # TWO warm epochs: the first compiles against the freshly-initialized
    # state's layout; its output state (donated buffers, device-committed)
    # can have a DIFFERENT jit signature, so the second call may compile
    # again — observed on the packed Trainer path (526 s Mosaic recompile
    # inside the trace window). The second warm epoch absorbs that.
    warm_s = []
    for w in range(2):
        t0 = time.perf_counter()
        state = one_epoch(state, w)
        warm_s.append(round(time.perf_counter() - t0, 3))
    # python_tracer off: epoch-long windows with tunnel value fetches
    # otherwise flood the ~1e6-event Chrome-trace cap with Python frames,
    # truncating the device lanes
    epoch_walls = []
    with trace(logdir, python_tracer=False):
        for e in range(N_TRACED_EPOCHS):
            t0 = time.perf_counter()
            state = one_epoch(state, e + 2)
            epoch_walls.append(round(time.perf_counter() - t0, 3))

    summary = parse_device_trace(logdir)
    n_steps = N_TRACED_EPOCHS * steps_per_epoch
    dev_step_us = summary["device_module_time_us"] / n_steps
    structs_per_step = c.get("structures_per_epoch",
                             c["B"] * steps_per_epoch) / steps_per_epoch
    trn_f = c["train_flops_per_step"]
    summary.update({
        "case": case, "B": c["B"], "M": c["M"], "N": c["N"],
        "steps_traced": n_steps,
        "warm_epoch_wall_s": warm_s,
        "traced_epoch_wall_s": epoch_walls,
        "train_flops_per_step": round(trn_f),
    })
    if dev_step_us > 0:
        summary.update({
            "device_ms_per_step": round(dev_step_us / 1e3, 4),
            "device_structures_per_sec": round(
                structs_per_step / (dev_step_us / 1e6), 1),
            "measured_tflops_per_sec": round(
                trn_f / (dev_step_us / 1e6) / 1e12, 2),
            "measured_mfu": round(
                trn_f / (dev_step_us / 1e6) / 1e12 / PEAK_TFLOPS, 4),
        })
    else:
        # no /device:TPU module events captured (CPU fallback backend, or
        # the tunnel dropped device events mid-capture) — still write the
        # summary with what we have instead of crashing after the full run
        summary["device_ms_per_step"] = None
        summary["note"] = ("no device-lane module events in the trace; "
                           "device-time metrics unavailable")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    keep = os.path.join(repo, "benchmarks", "traces", case)
    os.makedirs(keep, exist_ok=True)
    shutil.copy(summary["trace_json"],
                os.path.join(keep, "device.trace.json.gz"))
    summary["kept_trace"] = os.path.relpath(
        os.path.join(keep, "device.trace.json.gz"), repo)
    out_path = os.path.join(repo, "benchmarks", f"trace_summary_{case}.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(
        description="Capture an on-device profiler trace of the train step")
    p.add_argument("case", nargs="?", default="qm9",
                   choices=["qm9", "mp2018", "qm9_packed"])
    p.add_argument("--logdir", default="",
                   help="trace output dir (default /tmp/scann_tpu_trace_<case>,"
                        " which is cleared; a user-supplied dir is preserved)")
    a = p.parse_args()
    main(a.case, logdir=a.logdir)
