#!/bin/bash
cd "$(dirname "$0")/.." && python -m thinshelllab_tpu.cli cmaes --env card --pop_size 8 --iter 10 --tot_step 60 --abs_step 10 "$@"
