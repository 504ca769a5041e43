#!/bin/bash
cd "$(dirname "$0")/.." && python -m thinshelllab_tpu.cli rl --env balancing --reward_name compute_reward_throwing_RL --Kb 100.0 --mu 5.0 --algo sac --tot_step 50 "$@"
