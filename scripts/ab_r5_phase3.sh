#!/bin/bash
# Round-5 phase-3 on-chip queue, ordered by value so a short tunnel window
# still lands the important numbers first:
#   1. warm ship bench (the BENCH_r05 headline config; heats the cache)
#   2. forward-tolerance stack A/B (cg_tol 3e-3 on top of refresh=8)
#   3. batched rollouts with spmv=xla (the batched trace named the vmapped
#      Pallas path as the batch serializer) at full + small scene scale
#   4. trajopt iters/hour (VERDICT r4 item 5)
#   5. ship-config cold compile (VERDICT r4 item 7 target <90 s)
#   6. 40k-tri crash triage
cd "$(dirname "$0")/.."
set -u
run() {
  echo "CONFIG=$1 ($(date +%H:%M:%S))"
  shift
  timeout 2400 env "$@" 2>&1 | grep -E '^\{|^#|iter |rc=' | tail -12
}
run warm_ship python bench.py
run cgtol3e3_refresh8 BENCH_CG_TOL=3e-3 python bench.py
# batched rollouts: the XLA DIA formulation vmaps into batched einsums
# (vmapped pallas_call lowers as a sequential per-element grid loop)
run batch8_xla BENCH_BATCH=8 BENCH_SPMV=xla python bench.py
run batch4_xla BENCH_BATCH=4 BENCH_SPMV=xla python bench.py
# batch scaling at CMA-ES/RL scene scale (1152 tris): the 10k bench scene
# is the index-rate worst case; population/env workloads are small scenes
run small_b1 BENCH_CLOTH_N=24 BENCH_STEPS=8 python bench.py
run small_b8_xla BENCH_CLOTH_N=24 BENCH_STEPS=8 BENCH_BATCH=8 \
  BENCH_SPMV=xla python bench.py
run small_b32_xla BENCH_CLOTH_N=24 BENCH_STEPS=8 BENCH_BATCH=32 \
  BENCH_SPMV=xla python bench.py
# trajopt iters/hour at the reference budget shape (50 steps/iter)
echo "CONFIG=trajopt_hour ($(date +%H:%M:%S))"
TRAJOPT_HOUR_TIMEOUT=2700 bash scripts/tpu_trajopt_hour.sh 30 2>&1 | tail -3
# ship-config cold compile (VERDICT r4 item 7 target <90 s)
run cold_ship BENCH_NO_CACHE=1 python bench.py
# 40k crash triage
echo "CONFIG=debug_40k ($(date +%H:%M:%S))"
bash scripts/debug_40k.sh /tmp/debug40k 2>&1 | tail -30
# leave the cache hot for the driver's end-of-round bench
run warm_final python bench.py
echo "phase3 done ($(date +%H:%M:%S))"
