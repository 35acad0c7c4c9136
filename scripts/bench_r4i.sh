#!/bin/sh
# Round-4 batch I: fused_split x6 casts (single-pass bf16 K=96) +
# sparse primary-cast SoA/subtile fix.
set -x
cd "$(dirname "$0")/.."
echo "=== I1: theater fused_split x6 (sub=8)"
FLEXLIGHT_SCHEME=fused_split timeout 1800 python scripts/bench_direct.py theater 1920 1080
echo "=== I2: theater fused_split x6 sub=16 vmem=32"
FLEXLIGHT_SCHEME=fused_split FLEXLIGHT_SPLIT_SUBTILE=16 FLEXLIGHT_SPLIT_VMEM_MB=32 timeout 1200 python scripts/bench_direct.py theater 1920 1080
echo "=== I3: dragon at HEAD (SoA+subtiled primary, ck=2 sub=8 defaults pending)"
FLEXLIGHT_SPARSE_CHUNK=2 FLEXLIGHT_SPARSE_SUBTILE=8 timeout 1800 python scripts/bench_direct.py dragon 1920 1080
echo "=== I4: theater fused_split x6 ablation (tex share recheck)"
FLEXLIGHT_SCHEME=fused_split timeout 2400 python scripts/bench_ablate.py theater 1920 1080
echo "BATCH R4I DONE"
