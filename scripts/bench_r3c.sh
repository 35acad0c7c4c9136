#!/bin/sh
# Round-3 batch C: dense-kernel subtile A/B (theater-class small scenes)
# x FORCE_2D, then the BASELINE refresh at the winning defaults.
set -x
cd "$(dirname "$0")/.."

echo "=== BATCH C1: theater 1080p direct, DENSE_SUBTILE x FORCE_2D"
for sub in 1 2 4 8; do
  FLEXLIGHT_DENSE_SUBTILE=$sub timeout 900 python scripts/bench_direct.py theater 1920 1080
done
for sub in 1 4 8; do
  FLEXLIGHT_FORCE_2D=1 FLEXLIGHT_DENSE_SUBTILE=$sub timeout 900 python scripts/bench_direct.py theater 1920 1080
done

echo "=== BATCH C2: emissive 512 + obj 720p at winning dense defaults"
timeout 900 python scripts/bench_direct.py emissive 512 512
FLEXLIGHT_FORCE_2D=1 timeout 900 python scripts/bench_direct.py emissive 512 512
timeout 900 python scripts/bench_direct.py obj 1280 720
FLEXLIGHT_FORCE_2D=1 timeout 900 python scripts/bench_direct.py obj 1280 720

echo "=== BATCH C3: north star at HEAD (full pipeline)"
timeout 1200 python bench.py
FLEXLIGHT_FORCE_2D=1 timeout 1200 python bench.py

echo "BATCH R3C DONE"
