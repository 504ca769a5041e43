#!/bin/bash
cd "$(dirname "$0")/.." && python -m thinshelllab_tpu.cli dp --env sliding --method cmaes --pop_size 10 --iter 5 --tot_step 50 --init_traj slide "$@"
