#!/bin/sh
# Round-4 batch K: x6 fused_split across scenes (default-flip evidence) +
# fixed ablation re-run.
set -x
cd "$(dirname "$0")/.."
echo "=== K1: emissive 512 fused_split x6"
FLEXLIGHT_SCHEME=fused_split timeout 900 python scripts/bench_direct.py emissive 512 512
echo "=== K2: obj 720p fused_split x6"
FLEXLIGHT_SCHEME=fused_split timeout 1200 python scripts/bench_direct.py obj 1280 720
echo "=== K3: cornell 256 fused_split x6"
FLEXLIGHT_SCHEME=fused_split timeout 900 python scripts/bench_direct.py cornell 256 256
echo "=== K4: cornell 256 kernel control"
timeout 600 python scripts/bench_direct.py cornell 256 256
echo "=== K5: theater fused_split x6 ablation (fixed matfetch stub)"
FLEXLIGHT_SCHEME=fused_split timeout 2400 python scripts/bench_ablate.py theater 1920 1080
echo "=== K6: dragon full defaults control"
timeout 1200 python scripts/bench_direct.py dragon 1920 1080
echo "BATCH R4K DONE"
