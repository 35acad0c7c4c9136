#!/bin/sh
# Chip-recovery watcher (round 5): probe the relay every 2 minutes; when
# a trivial device op succeeds, run batches R5A + R5B and exit.
cd "$(dirname "$0")/.."
while true; do
  if timeout 180 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" >/dev/null 2>&1; then
    echo "chip reachable $(date)" >> /tmp/r5watch.log
    sh scripts/bench_r5a.sh > /tmp/r5a.log 2>&1
    sh scripts/bench_r5b.sh > /tmp/r5b.log 2>&1
    echo "batches done $(date)" >> /tmp/r5watch.log
    exit 0
  fi
  echo "chip down $(date)" >> /tmp/r5watch.log
  sleep 120
done
