#!/bin/bash
# Round-5 phase-5 on-chip queue (after the _assemble_buffers fix):
#   1. trajopt iters/hour retry via the chunked forward (FWD_CHUNK=7;
#      the T=49 single-program scan kernel-faults the TPU worker)
#   2. the Newton-cap ladder legs the phase-4 bug voided (newton5/4)
#   3. BENCH_TAPE_CONTACTS=1 (skip the backward broadphase/contact replay)
#   4. folding adjoint accuracy on-chip: compensated carries + highest
#      matmul precision stacked (VERDICT r4 item 6 best f32 shot)
#   5. final ship bench (warm)
#   6. fold T=50 forward-only crash confirmation (LAST: may kill worker)
# ONE TPU process at a time.
cd "$(dirname "$0")/.."
set -u
run() {
  echo "CONFIG=$1 ($(date +%H:%M:%S))"
  shift
  timeout 3600 env "$@" 2>&1 | \
    grep -E '^\{|^#|^OK|^T=|iter |rel |end-to-end|adjoint-isolated|Error|CRASH|UNAVAILABLE' | tail -14
}
run trajopt_hour_chunked TRAJOPT_HOUR_TIMEOUT=3000 FWD_CHUNK=7 \
  bash scripts/tpu_trajopt_hour.sh 30
# cap below hess_refresh saves nothing (the micro fori_loop computes all
# `refresh` iterations and masks the extras -- phase-4's newton6 leg
# measured exactly flat at 6.61); pair the cap with refresh=cap so the
# loop actually shortens: 1 rebuild + cap micro iterations per step
run newton5 BENCH_NEWTON=5 BENCH_HESS_REFRESH=5 python bench.py
run newton4 BENCH_NEWTON=4 BENCH_HESS_REFRESH=4 python bench.py
run tape_contacts BENCH_TAPE_CONTACTS=1 python bench.py
run grad_folding_all python scripts/grad_accuracy.py all folding
run grad_folding_comp_hp JAX_DEFAULT_MATMUL_PRECISION=highest GRAD_ACC_COMP=1 \
  python scripts/grad_accuracy.py adjoint folding /tmp/grad_folding_f64.npz \
  /tmp/grad_folding_f32adj_comp_hp.npz
run grad_folding_comp_hp_cmp python scripts/grad_accuracy.py compare \
  /tmp/grad_folding_f32adj_comp_hp.npz /tmp/grad_folding_f64.npz
run ship_final python bench.py
# Pallas pay-or-delete (VERDICT r4 item 4) at the ship config: if the XLA
# DIA formulation matches the Pallas kernels, the custom path is compile
# cost without wall-clock benefit
run ship_xla BENCH_SPMV=xla python bench.py
run fold_T50_fwd python scripts/triage_folding.py 50
echo "phase5 done ($(date +%H:%M:%S))"
