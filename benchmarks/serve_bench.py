"""Serving latency/throughput benchmark for the BatchedPredictor path.

Measures the production serving stack end-to-end on real hardware —
request -> coalescing -> host featurization (Voronoi) -> padded device
batch -> fused forward -> response — and reports the host/device split.

Three phases:
  1. sequential single-structure requests (interactive latency: p50/p95),
  2. C concurrent clients x R requests each (coalescing throughput +
     tail latency under load),
  3. the same structures through ``compute_voronoi_neighbors`` alone
     (attributes the serving latency to featurization vs device).

The reference has no serving story at all (SURVEY.md C17: one-off CLI
scripts); these numbers document what the TPU framework's deployment path
actually delivers and where its ceiling is (host featurization is
single-core Python; the device forward is a single fused kernel launch).

Usage: python benchmarks/serve_bench.py  [--clients 8] [--requests 20]
Writes benchmarks/serve_latency.json.
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_molecules(n, rng):
    """Voronoi-safe synthetic molecules: jittered cubic-ish clusters of
    8-18 atoms (H/C/N/O), ~1.2 A minimum separation."""
    from scann_tpu.data.structure import Structure

    species_pool = ["H", "C", "N", "O"]
    out = []
    for _ in range(n):
        na = int(rng.integers(8, 19))
        # jittered grid points -> no coincident/degenerate sites
        grid = np.array([[i, j, k] for i in range(3) for j in range(3)
                         for k in range(3)], float) * 1.6
        sel = rng.permutation(len(grid))[:na]
        coords = grid[sel] + rng.normal(0, 0.15, (na, 3))
        species = [species_pool[int(i)] for i in rng.integers(0, 4, na)]
        out.append(Structure(species, coords))
    return out


def pctl(xs, q):
    return float(np.percentile(np.asarray(xs), q))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=20)
    ap.add_argument("--seq", type=int, default=30)
    args = ap.parse_args()

    import jax

    # the axon plugin ignores JAX_PLATFORMS=cpu; only the config update
    # reliably keeps a CPU run off a hung tunnel (see DESIGN.md pitfalls)
    if os.environ.get("SCANN_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "")

    from scann_tpu.api import Scann
    from scann_tpu.config import HyperConfig, ModelConfig, ScannConfig
    from scann_tpu.data.voronoi import compute_voronoi_neighbors
    from scann_tpu.serve import BatchedPredictor

    # flagship QM9 architecture (the shape a real deployment serves)
    cfg = ScannConfig(
        model=ModelConfig(n_atoms=95, embedding_dim=48, n_attention=7,
                          local_dim=128, num_head=8, global_dim=128,
                          dense_out=128, g_update=True, use_ga_norm=True),
        hyper=HyperConfig(batch_size=32, target="homo",
                          save_path="/tmp/scann_serve_bench"),
    )
    scann = Scann(cfg)
    scann.trainer.init_state(scann._example_inputs())
    rng = np.random.default_rng(0)
    mols = make_molecules(64, rng)

    # warmup: run the WHOLE bench distribution once so every ladder rung it
    # hits is compiled before measurement — the phases below then measure
    # steady-state serving (production deployments warm their own data
    # distribution the same way: BatchedPredictor warms the trained bucket
    # shapes by default, or operator-supplied warmup_shapes). Cold-start
    # compile cost is reported separately by warmup_s.
    t0 = time.perf_counter()
    scann.predict_structures(mols)
    warmup_s = time.perf_counter() - t0

    # --- phase 1: sequential single-structure latency --------------------
    lat = []
    for i in range(args.seq):
        t0 = time.perf_counter()
        scann.predict_structures([mols[i % len(mols)]])
        lat.append(time.perf_counter() - t0)

    # --- phase 2: concurrent clients through the coalescer, A/B over the
    # overlap pipeline (round-4 VERDICT #5: featurize batch k+1 while
    # batch k executes — the two stages used to serialize per cycle) -----
    def run_concurrent(overlap):
        pred = BatchedPredictor(scann, max_batch=64, window_ms=5.0,
                                overlap=overlap)
        lat_c, errs = [], []
        lock = threading.Lock()

        def client(cid):
            crng = np.random.default_rng(cid)
            for _ in range(args.requests):
                m = mols[int(crng.integers(0, len(mols)))]
                t0 = time.perf_counter()
                try:
                    pred.predict([m], timeout=120)
                    dt = time.perf_counter() - t0
                    with lock:
                        lat_c.append(dt)
                except Exception as e:  # Overloaded/timeout counts against us
                    with lock:
                        errs.append(repr(e))

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client, args=(c,))
                   for c in range(args.clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        pred.close()
        return lat_c, errs, wall

    lat_seq_mode, errs_seq_mode, wall_seq_mode = run_concurrent(False)
    lat_c, errs, wall = run_concurrent(True)

    # --- in-process stage split (no HTTP; device calls still ride this
    # host's tunnel RTT — a real deployment's chip is local): one big
    # batched call, then its two stages separately, so the deployment docs
    # can attribute serving capability to host vs device vs coalescing ---
    t0 = time.perf_counter()
    scann.predict_structures(mols)
    t_batched = time.perf_counter() - t0
    t0 = time.perf_counter()
    structs_f, inputs_f = scann.featurize_structures(mols)
    t_feat = time.perf_counter() - t0
    t0 = time.perf_counter()
    scann.predict_featurized(structs_f, inputs_f)
    t_dev = time.perf_counter() - t0

    # --- phase 3: featurization-only on the same structures --------------
    t0 = time.perf_counter()
    for m in mols[:16]:
        compute_voronoi_neighbors(m, d_thresh=4.0, w_thresh=0.4)
    feat_ms = (time.perf_counter() - t0) / 16 * 1e3

    n_ok = len(lat_c)
    n_ok_seq = len(lat_seq_mode)
    out = {
        "sequential": {"p50_ms": round(pctl(lat, 50) * 1e3, 1),
                       "p95_ms": round(pctl(lat, 95) * 1e3, 1),
                       "n": len(lat)},
        "concurrent": {"clients": args.clients,
                       "requests_per_client": args.requests,
                       "throughput_structs_per_s": round(n_ok / wall, 1),
                       "p50_ms": round(pctl(lat_c, 50) * 1e3, 1) if n_ok else None,
                       "p95_ms": round(pctl(lat_c, 95) * 1e3, 1) if n_ok else None,
                       "errors": len(errs),
                       "overlap": True},
        "concurrent_no_overlap": {
            "throughput_structs_per_s": round(n_ok_seq / wall_seq_mode, 1),
            "p50_ms": (round(pctl(lat_seq_mode, 50) * 1e3, 1)
                       if n_ok_seq else None),
            "errors": len(errs_seq_mode)},
        # one fused call over the whole 64-structure set, then its stages:
        # host featurization vs device execution (device numbers on this
        # host include the axon tunnel RTT; a deployment's chip is local)
        "in_process": {
            "batched_structs_per_s": round(len(mols) / t_batched, 1),
            "featurize_structs_per_s": round(len(mols) / t_feat, 1),
            "device_structs_per_s": round(len(mols) / t_dev, 1)},
        "featurize_only_ms_per_structure": round(feat_ms, 1),
        "warmup_s": round(warmup_s, 1),  # cold-start: all rung compiles
        "host": {"cores": os.cpu_count()},
        "backend": jax.default_backend(),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "serve_latency.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
