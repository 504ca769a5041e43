#!/bin/bash
cd "$(dirname "$0")/.." && python -m thinshelllab_tpu.cli rl --env interact --reward_name compute_reward_1 --Kb 100.0 --mu 5.0 --algo recurrent_ppo --tot_step 50 "$@"
