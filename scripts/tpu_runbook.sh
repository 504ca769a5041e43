#!/bin/bash
# TPU-return runbook: the ordered measurements queued while the axon TPU
# tunnel was down (BASELINE.md round-3 part-2 note). Runs ONE TPU process
# at a time (the chip is exclusive; concurrent claims queue silently) and
# logs everything under $OUT. Each step is bounded by timeout so a dead
# tunnel cannot wedge the run.
#
# Usage: bash scripts/tpu_runbook.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/runbook_out}
mkdir -p "$OUT"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "--- rc=$rc; tail:"; tail -5 "$OUT/$name.log"
}

# 1. smoke: tiny bench proves the tunnel + compile path work at all
run smoke 600 env BENCH_CLOTH_N=24 BENCH_STEPS=2 BENCH_REPS=1 python bench.py

# 2. full bench (vs r02: 3.55 steps/s, 238 s compile)
run bench_full 1800 python bench.py

# 3. A/B: pallas vs xla SpMV inside the full step
run ab_spmv 1500 python scripts/ab_step_spmv.py

# 4. device trace: top ops vs the round-2 list (fused-store reshape ~30ms?
#    loop-boundary layout thrash? residual-path gathers?)
run trace 1500 python scripts/trace_step.py

# 5. forward-CG warm start: TPU wall-clock of the -20% iteration count
run warmstart 1200 python scripts/probe_fwd_cg.py 70 4

# 6. hess_refresh A/B: probe_refresh showed rebuilds halve at refresh=4
#    with equal Newton/CG counts and final residuals (CPU, hardware-
#    independent); measure the TPU wall-clock at 2 vs 4
run bench_refresh4 1800 env BENCH_HESS_REFRESH=4 python bench.py

# 7. spatial hash: step-level A/B + 40k-tri scaling (PARITY gap #3)
run ab_hash 1500 python scripts/ab_step_hash.py
run hash_40k 1800 env BENCH_CLOTH_N=140 BENCH_STEPS=2 BENCH_REPS=1 python bench.py

# 8. TPU-f32 gradient accuracy (post NaN-guard fix; CPU-f32 numbers in
#    BASELINE.md round-3 part-3: bench24 4.98e-4 iterative / 5.78e-5 dense,
#    folding 1.14e-2 / 4.3e-3)
run grad_folding 1800 python scripts/grad_accuracy.py all folding
run grad_bench24 1800 python scripts/grad_accuracy.py all bench24

# 9. solver=auto (dense) task-scene wall clock on TPU: per-iter time of the
#    CLI default vs the forced iterative path on a reference-sized scene
run trajopt_auto 900 python -m thinshelllab_tpu.cli trajopt --env folding \
  --iter 3 --tot_step 10 --solver auto
run trajopt_cg 900 python -m thinshelllab_tpu.cli trajopt --env folding \
  --iter 3 --tot_step 10 --solver cg

echo "=== runbook done; logs in $OUT ==="
