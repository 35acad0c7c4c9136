#!/bin/sh
# Round-4 batch B: filter-chain anatomy at HEAD (VERDICT item 4 prep) +
# dragon roofline (item 3).
set -x
cd "$(dirname "$0")/.."
echo "=== B1: filter anatomy 1080p (per-part attribution)"
timeout 1800 python scripts/bench_filter_anatomy.py 1080 1920
echo "=== B2: filter kernels synthetic mixed/uniform at HEAD"
timeout 1800 python scripts/bench_filters.py 1080 1920
echo "=== B3: real-frame filter costs (fast keys)"
timeout 1800 python scripts/bench_filters_real.py theater 1920 1080 || true
echo "=== B4: dragon roofline"
timeout 2400 python scripts/roofline.py dragon 1920 1080
echo "BATCH R4B DONE"
