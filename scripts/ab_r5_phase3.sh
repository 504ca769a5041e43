#!/bin/bash
# Round-5 phase-3 on-chip queue: batch scaling at the small-scene scale the
# batched workloads (CMA-ES populations, RL envs) actually use, the trajopt
# iters/hour measurement (VERDICT r4 item 5), the 40k-tri crash triage, and
# the ship-config cold-compile + warm-cache benches for BENCH_r05.
cd "$(dirname "$0")/.."
set -u
run() {
  echo "CONFIG=$1 ($(date +%H:%M:%S))"
  shift
  timeout 2400 env "$@" 2>&1 | grep -E '^\{|^#|iter |rc=' | tail -12
}
# 1. batch scaling at CMA-ES/RL scene scale (1152 tris): the 10k bench
#    scene is the index-rate worst case; the population/env workloads are
#    latency-dominated small scenes where batching should amortize
run small_b1 BENCH_CLOTH_N=24 BENCH_STEPS=8 python bench.py
run small_b8 BENCH_CLOTH_N=24 BENCH_STEPS=8 BENCH_BATCH=8 python bench.py
run small_b32 BENCH_CLOTH_N=24 BENCH_STEPS=8 BENCH_BATCH=32 python bench.py
# 1b. the batched trace names the vmapped Pallas kernels as the batch
#     serializer (per-element slice-start/copy plumbing + sequential grid):
#     the XLA DIA formulation vmaps into batched einsums instead
run batch8_xla BENCH_BATCH=8 BENCH_SPMV=xla python bench.py
run small_b8_xla BENCH_CLOTH_N=24 BENCH_STEPS=8 BENCH_BATCH=8 \
  BENCH_SPMV=xla python bench.py
# 2. trajopt iters/hour at the reference budget shape (50 steps/iter)
echo "CONFIG=trajopt_hour ($(date +%H:%M:%S))"
bash scripts/tpu_trajopt_hour.sh 30 2>&1 | tail -3
# 3. 40k crash triage
echo "CONFIG=debug_40k ($(date +%H:%M:%S))"
bash scripts/debug_40k.sh /tmp/debug40k 2>&1 | tail -30
# 4. ship-config cold compile (VERDICT r4 item 7 target <90 s)
run cold_ship BENCH_NO_CACHE=1 python bench.py
# 5. ship-config warm bench (leaves the cache hot for the driver)
run warm_ship python bench.py
echo "phase3 done ($(date +%H:%M:%S))"
