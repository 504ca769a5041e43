#!/bin/bash
# Round-5 TPU runbook: the three measurements VERDICT r4 item 3 says have
# slipped two rounds, in priority order, ONE TPU process at a time.
#   1. TPU-f32 adjoint accuracy on the f64 oracle tapes (bench24 + folding)
#   2. spatial-hash broadphase ms/step vs the <4 ms criterion
#   3. 40k-tri scaling row
# Usage: bash scripts/tpu_runbook_r5.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/runbook_r5}
mkdir -p "$OUT"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "--- rc=$rc; tail:"; tail -8 "$OUT/$name.log"
}

run grad_bench24 2400 python scripts/grad_accuracy.py all bench24
# 4. matmul-precision A/B (run 1 found TPU-f32 adjoint-isolated rel err
#    5.5e-2 vs 4.98e-4 for the same algorithm in CPU f32: the suspect is
#    the TPU's DEFAULT f32 matmul precision = bf16 MXU passes). Reuses the
#    f64 oracle tape written by grad_bench24.
run grad_bench24_hp 2400 env JAX_DEFAULT_MATMUL_PRECISION=highest \
  python scripts/grad_accuracy.py adjoint bench24 /tmp/grad_bench24_f64.npz \
  /tmp/grad_bench24_f32adj_hp.npz
run grad_bench24_hp_cmp 300 python scripts/grad_accuracy.py compare \
  /tmp/grad_bench24_f32adj_hp.npz /tmp/grad_bench24_f64.npz
run grad_folding 2400 python scripts/grad_accuracy.py all folding
run grad_folding_hp 2400 env JAX_DEFAULT_MATMUL_PRECISION=highest \
  python scripts/grad_accuracy.py adjoint folding /tmp/grad_folding_f64.npz \
  /tmp/grad_folding_f32adj_hp.npz
run grad_folding_hp_cmp 300 python scripts/grad_accuracy.py compare \
  /tmp/grad_folding_f32adj_hp.npz /tmp/grad_folding_f64.npz
run ab_hash 1800 python scripts/ab_step_hash.py
run hash_40k 2400 env BENCH_CLOTH_N=140 BENCH_STEPS=2 BENCH_REPS=1 python bench.py

echo "=== runbook_r5 done ($(date +%H:%M:%S)); logs in $OUT ==="
