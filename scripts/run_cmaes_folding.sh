#!/bin/bash
cd "$(dirname "$0")/.." && python -m thinshelllab_tpu.cli cmaes --env folding --pop_size 40 --iter 15 --tot_step 80 --abs_step 10 "$@"
