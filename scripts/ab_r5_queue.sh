#!/bin/bash
# Round-5 on-chip A/B queue: one bench per config, sequential (the TPU is
# exclusive). Each line prints CONFIG= then the bench JSON. Full-size
# compiles are ~4 min each cold; results land in /tmp/ab_r5.log.
cd "$(dirname "$0")/.."
set -u
run() {
  echo "CONFIG=$1"
  shift
  timeout 1500 env "$@" python bench.py 2>&1 | grep -E '^\{|^#' || echo FAILED
}
run contact_mm_off TSL_CONTACT_MM=0
run spd_shift BENCH_SPD=shift
run refresh8 BENCH_HESS_REFRESH=8
run fwd_tol_3e3 BENCH_CG_TOL=3e-3
run batch4 BENCH_BATCH=4
run batch8 BENCH_BATCH=8
echo "CONFIG=mem_analysis"
timeout 2400 python scripts/mem_analysis.py 1 4 8 2>&1 | grep -E '^\{' || echo FAILED
