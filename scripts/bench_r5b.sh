#!/bin/sh
# Round-5 batch B: bike (the unmeasured 512-4096 band, VERDICT item 4),
# full-pipeline numbers at the new defaults, input-to-photon latency
# (item 7), cold-compile budget (item 8).
set -x
cd "$(dirname "$0")/.."
echo "=== B1: bike 1080p direct, kernel scheme (auto default)"
timeout 2400 python scripts/bench_direct.py bike 1920 1080 3
echo "=== B2: bike 1080p direct, fused_split"
FLEXLIGHT_SCHEME=fused_split timeout 2400 python scripts/bench_direct.py bike 1920 1080 3
echo "=== B3: obj 720p direct (band re-check at new tex stage)"
timeout 1200 python scripts/bench_direct.py obj 1280 720 4
echo "=== B4: emissive 512 direct"
timeout 900 python scripts/bench_direct.py emissive 512 512 6
echo "=== B5: input-to-photon latency (cornell 256, depths 0-4)"
timeout 1800 python scripts/bench_latency.py cornell 256 8
echo "=== B6: full bench.py at HEAD"
timeout 3600 python bench.py
echo "=== B7: cold vs warm compile budget (theater 1080p full)"
timeout 3600 python scripts/bench_cold_compile.py cold
timeout 1200 python scripts/bench_cold_compile.py warm
echo "BATCH R5B DONE"
