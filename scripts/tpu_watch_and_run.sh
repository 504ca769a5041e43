#!/bin/bash
# Tunnel recovery watcher: probe the TPU claim every 3 minutes with a tiny
# jnp.sum; when a probe succeeds, run the given command once and exit.
# ONE TPU process at a time -- the probe itself exits before the payload
# starts. Usage: scripts/tpu_watch_and_run.sh <logfile> <cmd...>
set -u
cd "$(dirname "$0")/.."
LOG=${1:?logfile}; shift
while true; do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() == 'tpu'
print(float(jnp.sum(jnp.ones((128, 128)))))" >/dev/null 2>&1; then
    echo "tunnel up ($(date +%H:%M:%S)); running payload" >> "$LOG"
    "$@" >> "$LOG" 2>&1
    echo "payload rc=$? ($(date +%H:%M:%S))" >> "$LOG"
    exit 0
  fi
  echo "tunnel down ($(date +%H:%M:%S))" >> "$LOG"
  sleep 180
done
