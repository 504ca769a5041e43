#!/bin/bash
cd "$(dirname "$0")/.." && python -m thinshelllab_tpu.cli rl --env lifting --timesteps 100000 "$@"
