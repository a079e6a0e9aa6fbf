"""Serving warm-restart benchmark: the executable cache across processes.

Round-3 finding: serving cold start pays one XLA/Pallas compile per ladder
rung — 112 s to 1192 s per process depending on co-tenant load (NEXT.md).
The executable cache (``utils/exec_cache.py``) serializes each compiled
rung to disk so a RESTARTED (or scaled-out) server loads instead of
recompiling. This script MEASURES that claim on real hardware:

  phase "cold":  fresh process, empty cache dir -> warm the full bench
                 request distribution (every ladder rung it touches),
                 report wall time + cache stats (compiles, save_errors);
  phase "warm":  a NEW process on the SAME cache dir -> same warmup,
                 report wall time + disk_hits.

Default mode orchestrates both phases as subprocesses (a true process
restart — in-process jit caches cannot leak between them) and writes
``benchmarks/serve_restart.json``.

Round-3 note: the axon remote-TPU plugin then raised on ``serialize``;
probed 2026-08-20 round 4: serialize/deserialize/execute round-trips work,
so this measurement runs on the real chip.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_phase(cache_dir: str) -> dict:
    import numpy as np

    from scann_tpu.api import Scann
    from scann_tpu.config import HyperConfig, ModelConfig, ScannConfig

    from serve_bench import make_molecules

    cfg = ScannConfig(
        model=ModelConfig(n_atoms=95, embedding_dim=48, n_attention=7,
                          local_dim=128, num_head=8, global_dim=128,
                          dense_out=128, g_update=True, use_ga_norm=True),
        hyper=HyperConfig(batch_size=32, target="homo",
                          save_path="/tmp/scann_serve_restart"),
    )
    scann = Scann(cfg)
    scann.trainer.init_state(scann._example_inputs())
    scann.enable_exec_cache(cache_dir)

    # attribute warmup time: serve-call (compile-or-load + device exec)
    # vs everything else (featurization, padding, host glue) — under
    # co-tenant load both vary, and the attribution is what makes the
    # cold/warm comparison interpretable
    serve_calls = []
    orig_call = scann._serve_call

    def timed_call(params, batch):
        t = time.perf_counter()
        out = orig_call(params, batch)
        serve_calls.append(time.perf_counter() - t)
        return out

    scann._serve_call = timed_call

    mols = make_molecules(64, np.random.default_rng(0))  # fixed distribution
    t0 = time.perf_counter()
    out = scann.predict_structures(mols)
    warmup_s = time.perf_counter() - t0
    assert all(np.isfinite(v) for v, _ in out)
    first_calls = list(serve_calls)
    # steady-state check: rungs now cached in-process
    serve_calls.clear()
    t0 = time.perf_counter()
    scann.predict_structures(mols[:8])
    steady_ms = (time.perf_counter() - t0) / 8 * 1e3
    return {"warmup_s": round(warmup_s, 1),
            "warmup_serve_call_s": round(sum(first_calls), 1),
            "warmup_serve_calls": [round(t, 2) for t in first_calls],
            "steady_ms_per_structure": round(steady_ms, 1),
            "first_prediction": round(float(out[0][0]), 8),
            "stats": scann._exec_cache.stats}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--phase", choices=["cold", "warm"], default=None)
    ap.add_argument("--cache-dir", default=None)
    args = ap.parse_args(argv)

    if args.phase:
        result = run_phase(args.cache_dir)
        print("PHASE_RESULT " + json.dumps(result))
        return

    cache_dir = args.cache_dir or tempfile.mkdtemp("serve_restart_cache")
    here = os.path.abspath(__file__)
    phases = {}
    for phase in ("cold", "warm"):
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, here, "--phase", phase, "--cache-dir", cache_dir],
            capture_output=True, text=True, timeout=3000)
        for line in proc.stdout.splitlines():
            if line.startswith("PHASE_RESULT "):
                phases[phase] = json.loads(line[len("PHASE_RESULT "):])
        if phase not in phases:
            print(proc.stdout[-2000:])
            print(proc.stderr[-2000:])
            raise SystemExit(f"{phase} phase failed (rc {proc.returncode})")
        phases[phase]["process_wall_s"] = round(time.time() - t0, 1)
        print(phase, json.dumps(phases[phase]), flush=True)

    # identical predictions across processes = the reloaded executables
    # compute the same function
    agree = (phases["cold"]["first_prediction"]
             == phases["warm"]["first_prediction"])
    out = {
        "cold": phases["cold"],
        "warm_restart": phases["warm"],
        "speedup_warmup": round(phases["cold"]["warmup_s"]
                                / max(phases["warm"]["warmup_s"], 1e-9), 1),
        "predictions_identical_across_restart": bool(agree),
        "cache_dir": cache_dir,
    }
    import jax

    out["backend"] = jax.default_backend()
    path = os.path.join(os.path.dirname(here), "serve_restart.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
