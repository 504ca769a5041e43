#!/bin/bash
cd "$(dirname "$0")/.." && python -m thinshelllab_tpu.cli dp --env sliding --iter 20 --lr 0.1 --tot_step 50 "$@"
