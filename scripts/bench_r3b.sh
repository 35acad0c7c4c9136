#!/bin/sh
# Round-3 batch B: dragon frame-coherent history-hint A/B, the re-run of
# the died-mid-run bounce-part decomposition (batch A2), and the
# FORCE_2D layout threshold sweep (A3 showed 2-D wins at theater 1080p:
# 191.2 -> 153.0; find where the crossover is).
set -x
cd "$(dirname "$0")/.."

echo "=== BATCH B1: dragon 1080p history-hint A/B (nearest2/history/prevtile)"
timeout 3600 python scripts/bench_history.py dragon 1920 1080 4

echo "=== BATCH B2: theater bounce parts (A2 re-run; died on relay error)"
timeout 2400 python scripts/bench_bounce_parts.py theater 1920 1080

echo "=== BATCH B3: FORCE_2D crossover sweep (small-table scenes)"
for sz in "256 256" "512 512" "1280 720" "1920 1080"; do
  timeout 900 python scripts/bench_direct.py cornell $sz
  FLEXLIGHT_FORCE_2D=1 timeout 900 python scripts/bench_direct.py cornell $sz
done
timeout 900 python scripts/bench_direct.py emissive 512 512
FLEXLIGHT_FORCE_2D=1 timeout 900 python scripts/bench_direct.py emissive 512 512
timeout 900 python scripts/bench_direct.py theater 1280 720
FLEXLIGHT_FORCE_2D=1 timeout 900 python scripts/bench_direct.py theater 1280 720

echo "=== BATCH B4: theater history-hint A/B (does coherence help small scenes?)"
timeout 1800 python scripts/bench_history.py theater 1920 1080 4

echo "BATCH R3B DONE"
