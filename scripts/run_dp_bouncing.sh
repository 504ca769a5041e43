#!/bin/bash
cd "$(dirname "$0")/.." && python -m thinshelllab_tpu.cli dp --env bouncing --iter 20 --lr 10 --tot_step 50 "$@"
