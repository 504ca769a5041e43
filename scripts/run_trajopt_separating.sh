#!/bin/bash
cd "$(dirname "$0")/.." && python -m thinshelllab_tpu.cli trajopt --env interact --iter 400 --tot_step 50 --lr 1e-5 "$@"
