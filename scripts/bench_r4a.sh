#!/bin/sh
# Round-4 batch A: fused_split v2 (subtile-looped programs, single Mosaic
# program for all bounces) vs the kernel-scheme default. VERDICT r3 item 1.
set -x
cd "$(dirname "$0")/.."
echo "=== A1: theater 1080p fused_split v2 (rt=1024, sub=8 default)"
FLEXLIGHT_SCHEME=fused_split timeout 1800 python scripts/bench_direct.py theater 1920 1080
echo "=== A2: theater fused_split v2 sub=4"
FLEXLIGHT_SCHEME=fused_split FLEXLIGHT_SPLIT_SUBTILE=4 timeout 1200 python scripts/bench_direct.py theater 1920 1080
echo "=== A3: theater fused_split v2 rt=2048 sub=4 (same rays/program, fewer loop steps)"
FLEXLIGHT_SCHEME=fused_split FLEXLIGHT_SPLIT_RAY_TILE=2048 FLEXLIGHT_SPLIT_SUBTILE=4 timeout 1200 python scripts/bench_direct.py theater 1920 1080
echo "=== A4: emissive 512 fused_split v2"
FLEXLIGHT_SCHEME=fused_split timeout 900 python scripts/bench_direct.py emissive 512 512
echo "=== A5: obj 720p fused_split v2"
FLEXLIGHT_SCHEME=fused_split timeout 1200 python scripts/bench_direct.py obj 1280 720
echo "BATCH R4A DONE"
