#!/bin/sh
# Round-3 batch D: roofline tables (VERDICT item 7) + e2e relay latency
# at the new pipelined/u8 path + north star at final defaults.
set -x
cd "$(dirname "$0")/.."

echo "=== BATCH D1: roofline theater 1080p"
timeout 2400 python scripts/roofline.py theater 1920 1080

echo "=== BATCH D2: roofline dragon 1080p"
timeout 2400 python scripts/roofline.py dragon 1920 1080

echo "=== BATCH D3: bench.py (cornell-256 e2e detail + north star)"
timeout 2400 python bench.py

echo "BATCH R3D DONE"
