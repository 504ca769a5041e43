#!/bin/bash
cd "$(dirname "$0")/.." && python -m thinshelllab_tpu.cli dp --env card --iter 20 --lr 1 --tot_step 50 "$@"
