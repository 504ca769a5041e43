#!/bin/bash
cd "$(dirname "$0")/.." && python -m thinshelllab_tpu.cli trajopt --env balancing --reward_name compute_reward_throwing --iter 500 --tot_step 50 --lr 1e-5 "$@"
