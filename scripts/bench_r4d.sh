#!/bin/sh
# Round-4 batch D: fused_split v2 with dense (rb, 128) brick channels
# (the (1, rt) sublane slices of batch A ran all elementwise VPU work at
# 1/8 throughput — the structural cause of every megakernel A/B loss).
set -x
cd "$(dirname "$0")/.."
echo "=== D1: theater 1080p fused_split BRICK (rt=1024, sub=8)"
FLEXLIGHT_SCHEME=fused_split timeout 1800 python scripts/bench_direct.py theater 1920 1080
echo "=== D2: theater fused_split BRICK sub=4"
FLEXLIGHT_SCHEME=fused_split FLEXLIGHT_SPLIT_SUBTILE=4 timeout 1200 python scripts/bench_direct.py theater 1920 1080
echo "=== D3: emissive 512 fused_split BRICK"
FLEXLIGHT_SCHEME=fused_split timeout 900 python scripts/bench_direct.py emissive 512 512
echo "=== D4: obj 720p fused_split BRICK"
FLEXLIGHT_SCHEME=fused_split timeout 1200 python scripts/bench_direct.py obj 1280 720
echo "=== D5: theater baseline control (kernel scheme, same day)"
timeout 900 python scripts/bench_direct.py theater 1920 1080
echo "BATCH R4D DONE"
