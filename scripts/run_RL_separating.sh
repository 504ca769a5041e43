#!/bin/bash
cd "$(dirname "$0")/.." && python -m thinshelllab_tpu.cli rl --env interact --Kb 0.1 --mu 5.0 --algo sac --tot_step 50 "$@"
