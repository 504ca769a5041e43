#!/bin/bash
# Round-5 phase-2 on-chip queue (after ab_r5_queue.sh): newton-cap probe +
# A/Bs stacked on the phase-1 winner (hess_refresh=8, +25%) + on-chip
# gradient accuracy. ONE TPU process at a time; each leg a separate
# process.
cd "$(dirname "$0")/.."
set -u
run() {
  echo "CONFIG=$1 ($(date +%H:%M:%S))"
  shift
  timeout 2400 env "$@" 2>&1 | grep -E '^\{|^#|iter |\|p\||phase|rc=' | tail -30
}
# 0. batched device trace: name the op(s) that serialize the batch
#    (batch4/batch8 walls scale exactly linearly in B -- zero amortization)
echo "CONFIG=trace_batch4 ($(date +%H:%M:%S))"
timeout 2400 env TRACE_BATCH=4 python scripts/trace_step.py 70 fwdbwd \
  > /tmp/trace_b4.log 2>&1
tail -60 /tmp/trace_b4.log
# 1. per-iteration |p| history + phase wall times at bench size
run newton_probe python scripts/probe_newton_tpu.py 70 3
# 2. taped-contact backward (skips the per-backward-step broadphase)
run tape_r8 BENCH_HESS_REFRESH=8 BENCH_TAPE_CONTACTS=1 python bench.py
# 3. newton cap 5 (interpret with the probe's |p| history)
run newton5_r8 BENCH_HESS_REFRESH=8 BENCH_NEWTON=5 python bench.py
# 4. Pallas pay-or-delete at the winner config
run spmv_xla_r8 BENCH_HESS_REFRESH=8 BENCH_SPMV=xla python bench.py
# 5. compensated-carry cost at the winner config
run comp_r8 BENCH_HESS_REFRESH=8 BENCH_COMP=1 python bench.py
# 6. batched rollouts on the winner + taped contacts (broadphase-temp
#    hypothesis for the batch collapse)
run batch8_r8_tape BENCH_HESS_REFRESH=8 BENCH_TAPE_CONTACTS=1 \
  BENCH_BATCH=8 python bench.py
# 6b. stack the two independent phase-1 wins (refresh8 +25%, tol3e-3 +9%)
run combo_r8_tol3e3 BENCH_HESS_REFRESH=8 BENCH_CG_TOL=3e-3 python bench.py
# 7. on-chip adjoint accuracy on the existing f64 folding tape, comp=0/1
for c in 0 1; do
  echo "CONFIG=grad_folding_comp$c"
  GRAD_ACC_COMP=$c timeout 2400 python scripts/grad_accuracy.py adjoint \
    folding /tmp/grad_folding_f64.npz /tmp/gf_tpu_c$c.npz 2>&1 | tail -2
  python scripts/grad_accuracy.py compare /tmp/gf_tpu_c$c.npz \
    /tmp/grad_folding_f64.npz 2>&1 | tail -1
done
echo "phase2 done ($(date +%H:%M:%S))"
