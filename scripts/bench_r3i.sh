#!/bin/sh
# Round-3 batch I2: re-measure after the any-hit fast epilogue
# (dense shadow casts) landed at 83b0bff.
set -x
cd "$(dirname "$0")/.."
echo "=== I0: roofline theater 1080p (re-run after the devtime pytree fix)"
timeout 2400 python scripts/roofline.py theater 1920 1080
echo "=== I1: theater 1080p direct at HEAD (any-hit epilogue)"
timeout 900 python scripts/bench_direct.py theater 1920 1080
echo "=== I2: north star at HEAD"
timeout 2700 python bench.py
echo "BATCH R3I DONE"
