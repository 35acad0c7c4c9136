#!/bin/sh
# Chip-recovery watcher: probe every 2 min; when reachable, run batch D.
cd "$(dirname "$0")/.."
while true; do
  if timeout 180 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" >/dev/null 2>&1; then
    echo "chip reachable $(date)" >> /tmp/r5watch.log
    sh scripts/bench_r5d.sh > /tmp/r5d.log 2>&1
    echo "batch D done $(date)" >> /tmp/r5watch.log
    exit 0
  fi
  echo "chip down $(date)" >> /tmp/r5watch.log
  sleep 120
done
