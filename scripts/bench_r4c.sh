#!/bin/sh
# Round-4 batch C: dragon sparse worklist granularity sweep (tri_tile x
# chunk were never chip-swept; the per-chunk-step VPU epilogue dominates
# incoherent casts). VERDICT r3 item 2.
set -x
cd "$(dirname "$0")/.."
echo "=== C1: dragon baseline (tt=128 ck=4)"
timeout 1800 python scripts/bench_direct.py dragon 1920 1080
echo "=== C2: dragon tt=256"
FLEXLIGHT_SPARSE_TRI_TILE=256 timeout 1200 python scripts/bench_direct.py dragon 1920 1080
echo "=== C3: dragon tt=64"
FLEXLIGHT_SPARSE_TRI_TILE=64 timeout 1200 python scripts/bench_direct.py dragon 1920 1080
echo "=== C4: dragon ck=8"
FLEXLIGHT_SPARSE_CHUNK=8 timeout 1200 python scripts/bench_direct.py dragon 1920 1080
echo "=== C5: dragon ck=2"
FLEXLIGHT_SPARSE_CHUNK=2 timeout 1200 python scripts/bench_direct.py dragon 1920 1080
echo "=== C6: dragon tt=256 ck=2 (same rows/step as baseline)"
FLEXLIGHT_SPARSE_TRI_TILE=256 FLEXLIGHT_SPARSE_CHUNK=2 timeout 1200 python scripts/bench_direct.py dragon 1920 1080
echo "=== C7: e2e anatomy cornell-256"
timeout 1200 python scripts/bench_e2e_anatomy.py 40
echo "BATCH R4C DONE"
