#!/bin/sh
# Round-4 batch G: fused_split brick attribution + deeper subtiling.
set -x
cd "$(dirname "$0")/.."
echo "=== G1: fused_split ablation (theater 1080p)"
FLEXLIGHT_SCHEME=fused_split timeout 2400 python scripts/bench_ablate.py theater 1920 1080
echo "=== G2: fused_split rt=512 sub=16 (same rays/program, narrower temps)"
FLEXLIGHT_SCHEME=fused_split FLEXLIGHT_SPLIT_RAY_TILE=512 FLEXLIGHT_SPLIT_SUBTILE=16 timeout 1200 python scripts/bench_direct.py theater 1920 1080
echo "=== G3: fused_split sub=16 vmem=32MB (16384 rays/program, 127 programs)"
FLEXLIGHT_SCHEME=fused_split FLEXLIGHT_SPLIT_SUBTILE=16 FLEXLIGHT_SPLIT_VMEM_MB=32 timeout 1200 python scripts/bench_direct.py theater 1920 1080
echo "BATCH R4G DONE"
