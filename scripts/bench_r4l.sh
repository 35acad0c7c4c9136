#!/bin/sh
# Round-4 batch L: north star at the new defaults (fused_split flip +
# sparse ck=2 sub=8).
set -x
cd "$(dirname "$0")/.."
echo "=== L1: bench.py full (all five configs, new defaults)"
timeout 3300 env FLEXLIGHT_BENCH_TIMEOUT=3200 python bench.py
echo "BATCH R4L DONE"
