#!/bin/bash
# Pending-hardware queue (NEXT.md): run everything that needs the real TPU
# in one shot, each step bounded and logged. Safe to re-run; continues past
# individual failures so one flaky compile doesn't lose the rest.
#
#   bash tools/run_hw_queue.sh [outdir]      (default results/hw_queue)
set -u
cd "$(dirname "$0")/.."
OUT="${1:-results/hw_queue}"
mkdir -p "$OUT"

echo "== 0. tunnel probe =="
if ! timeout 120 python -c "import jax; print(jax.devices())"; then
  echo "tunnel DOWN — aborting (nothing below can run)"; exit 2
fi

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "== $name (timeout ${t}s) =="
  timeout "$t" "$@" 2>&1 | tee "$OUT/$name.log"
  echo "exit=$? -> $OUT/$name.log"
}

# 1. authoritative dropout mask-replay + FD checks (never run on hw yet)
run tpu_checks 1800 python tools/tpu_checks.py

# 2. headline bench (driver also runs this at round end)
run bench 3600 python bench.py

# 3. serving latency/throughput on the real chip
run serve_bench 3600 python benchmarks/serve_bench.py

# 4. per-component step breakdown + MFU
run step_breakdown_qm9 3600 python tools/step_breakdown.py qm9
run step_breakdown_mp2018 3600 python tools/step_breakdown.py mp2018

echo "== done; logs in $OUT =="
