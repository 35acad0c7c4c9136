#!/bin/sh
# Round-4 batch M: flavor-3 (in-kernel tex) A/B.
set -x
cd "$(dirname "$0")/.."
echo "=== M1: theater fused_split flavor3"
timeout 1800 python scripts/bench_direct.py theater 1920 1080
echo "=== M2: theater fused_split legacy tex control"
FLEXLIGHT_SPLIT_TEX=xla timeout 1200 python scripts/bench_direct.py theater 1920 1080
echo "=== M3: obj 720p flavor3"
timeout 1200 python scripts/bench_direct.py obj 1280 720
echo "=== M4: emissive 512 flavor3"
timeout 900 python scripts/bench_direct.py emissive 512 512
echo "=== M5: theater flavor3 ablation"
timeout 2400 python scripts/bench_ablate.py theater 1920 1080
echo "=== M6: theater stage breakdown at new defaults"
timeout 2400 python scripts/bench_stages.py theater 1920 1080
echo "BATCH R4M DONE"
