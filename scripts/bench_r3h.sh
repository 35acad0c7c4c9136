#!/bin/sh
# Round-3 batch H tail: runs after the north-star bench. Rooflines
# (VERDICT r2 item 7 — never landed: every prior attempt died on the
# batch-C/D OOM regression), dragon HEAD sanity, then the 720p use2d
# crossover point and the FORCE_2D bounce-part decomposition.
set -x
cd "$(dirname "$0")/.."

echo "=== H2: roofline theater 1080p"
timeout 2400 python scripts/roofline.py theater 1920 1080
echo "=== H3: roofline dragon 1080p"
timeout 2400 python scripts/roofline.py dragon 1920 1080
echo "=== H4: dragon 1080p direct at HEAD"
timeout 1200 python scripts/bench_direct.py dragon 1920 1080
echo "=== H5: theater 720p flat vs 2-D (crossover refinement)"
timeout 900 python scripts/bench_direct.py theater 1280 720
FLEXLIGHT_FORCE_2D=1 timeout 900 python scripts/bench_direct.py theater 1280 720
echo "=== H6: theater 1080p bounce parts under the 2-D default"
timeout 1800 python scripts/bench_bounce_parts.py theater 1920 1080
echo "BATCH R3H DONE"
