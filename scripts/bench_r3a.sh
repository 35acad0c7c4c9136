#!/bin/sh
# Round-3 batch A: fast-filter stage breakdown + bounce-part budget +
# the corrected shade-kernel A/B (VERDICT r2: the r2b run lacked
# FORCE_2D so the kernel never engaged).
set -x
cd "$(dirname "$0")/.."

echo "=== BATCH A1: theater stage breakdown (fast filter default)"
timeout 2400 python scripts/bench_stages.py theater 1920 1080

echo "=== BATCH A2: theater bounce parts at HEAD"
timeout 2400 python scripts/bench_bounce_parts.py theater 1920 1080

echo "=== BATCH A3: theater direct, corrected SHADE_KERNEL A/B"
FLEXLIGHT_FORCE_2D=1 timeout 1200 python scripts/bench_direct.py theater 1920 1080
FLEXLIGHT_FORCE_2D=1 FLEXLIGHT_SHADE_KERNEL=1 timeout 1200 python scripts/bench_direct.py theater 1920 1080

echo "=== BATCH A4: fast-vs-compat image delta report (1080p)"
timeout 3600 python scripts/fast_vs_compat.py --size 1920x1080 --scenes theater,cornell,emissive

echo "BATCH R3A DONE"
