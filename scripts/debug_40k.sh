#!/bin/bash
# Isolate the 40k-tri (BENCH_CLOTH_N=140) TPU worker crash ("kernel fault",
# round-5 runbook). Legs, each a separate process so a crash doesn't kill
# the sweep; ONE TPU process at a time:
#   1. fwd-only rollout (no adjoint) -- is the crash in the backward?
#   2. full bench with the XLA SpMV (no Pallas) -- is it the Mosaic kernel?
#   3. full bench with the hash broadphase disabled (dense sweep)
#   4. intermediate size N=100 -- size threshold?
# Usage: bash scripts/debug_40k.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/debug40k}
mkdir -p "$OUT"
run() { local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  echo "--- rc=$?; tail:"; tail -4 "$OUT/$name.log"
}
run fwd_only 2400 python scripts/trace_step.py 140 fwd
run spmv_xla 2400 env BENCH_CLOTH_N=140 BENCH_STEPS=2 BENCH_REPS=1 \
  BENCH_SPMV=xla python bench.py
run no_hash 2400 env BENCH_CLOTH_N=140 BENCH_STEPS=2 BENCH_REPS=1 \
  BENCH_HASH_MIN_FACES=1000000 python bench.py
run n100 2400 env BENCH_CLOTH_N=100 BENCH_STEPS=2 BENCH_REPS=1 python bench.py
echo "=== debug_40k done ($(date +%H:%M:%S)) ==="
