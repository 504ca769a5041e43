#!/bin/bash
cd "$(dirname "$0")/.." && python -m thinshelllab_tpu.cli cmaes --env pick --reward_name compute_reward_pick_fold --Kb 200 --mu 5.0 --pop_size 40 --iter 30 --tot_step 50 --abs_step 10 --sigma 2.5 --max_dist 0.001 "$@"
