#!/bin/bash
cd "$(dirname "$0")/.." && python -m thinshelllab_tpu.cli rl --env folding --timesteps 100000 "$@"
