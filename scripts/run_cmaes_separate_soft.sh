#!/bin/bash
cd "$(dirname "$0")/.." && python -m thinshelllab_tpu.cli cmaes --env interact --Kb 0.1 --mu 5.0 --dense 20000.0 --pop_size 40 --iter 15 --tot_step 30 --abs_step 5 --sigma 2.5 "$@"
