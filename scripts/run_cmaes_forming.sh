#!/bin/bash
cd "$(dirname "$0")/.." && python -m thinshelllab_tpu.cli cmaes --env forming --Kb 200 --mu 5.0 --pop_size 40 --iter 15 --tot_step 50 --abs_step 5 --sigma 2.5 --max_dist 0.001 "$@"
