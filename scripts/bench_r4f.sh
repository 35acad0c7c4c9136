#!/bin/sh
# Round-4 batch F: dragon chunk refinement (C5: ck=2 won 837.5->806.9;
# finer early-exit granularity beats loop overhead) + tt=256 variants.
set -x
cd "$(dirname "$0")/.."
echo "=== F1: dragon ck=1"
FLEXLIGHT_SPARSE_CHUNK=1 timeout 1200 python scripts/bench_direct.py dragon 1920 1080
echo "=== F2: dragon tt=256 ck=1 (m=256)"
FLEXLIGHT_SPARSE_TRI_TILE=256 FLEXLIGHT_SPARSE_CHUNK=1 timeout 1200 python scripts/bench_direct.py dragon 1920 1080
echo "=== F3: dragon ck=2 + subtile=8"
FLEXLIGHT_SPARSE_CHUNK=2 FLEXLIGHT_SPARSE_SUBTILE=8 timeout 1200 python scripts/bench_direct.py dragon 1920 1080
echo "BATCH R4F DONE"
