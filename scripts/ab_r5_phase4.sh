#!/bin/bash
# Round-5 phase-4 on-chip queue: the Newton-budget attack + crash triage.
#   1. host-driven Newton diagnostics (per-iteration |p|, CG iters, phase
#      times) -- sizes the cap cut
#   2. BENCH_NEWTON ladder 6/5/4 (f64 drift certification runs on CPU in
#      parallel: scripts/probe_newton_drift.py)
#   3. BENCH_TAPE_CONTACTS=1 (skip the backward broadphase/contact replay)
#   4. folding forward-only crash bisect by scan length (T=2/10/50)
# ONE TPU process at a time.
cd "$(dirname "$0")/.."
set -u
run() {
  echo "CONFIG=$1 ($(date +%H:%M:%S))"
  shift
  timeout 2400 env "$@" 2>&1 | grep -E '^\{|^#|^OK|^T=|iter |\|p\||phase|CG|alpha|rel drift|Error|CRASH|UNAVAILABLE' | tail -24
}
run newton_probe python scripts/probe_newton_tpu.py 70 3
run newton6 BENCH_NEWTON=6 python bench.py
run newton5 BENCH_NEWTON=5 python bench.py
run newton4 BENCH_NEWTON=4 python bench.py
run tape_contacts BENCH_TAPE_CONTACTS=1 python bench.py
run fold_T2 python scripts/triage_folding.py 2
run fold_T10 python scripts/triage_folding.py 10
run fold_T50 python scripts/triage_folding.py 50
echo "phase4 done ($(date +%H:%M:%S))"
