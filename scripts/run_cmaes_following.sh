#!/bin/bash
cd "$(dirname "$0")/.." && python -m thinshelllab_tpu.cli cmaes --env interact --reward_name compute_reward_1 --Kb 100 --mu 5.0 --dense 20000.0 --pop_size 40 --iter 10 --tot_step 30 --abs_step 5 --sigma 2.5 "$@"
