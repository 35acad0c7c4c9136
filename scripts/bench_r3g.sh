#!/bin/sh
# Round-3 batch G: batch F reordered so the decision-critical runs land
# first (use2d crossover -> default flip; north star), with the long
# decompositions/rooflines at the tail where a wall-clock cutoff only
# costs documentation, not decisions. Adds the rt2048 x subtile4 dense
# A/B the scoped-VMEM clamp (ec2977c) made reachable: same 8192 grouped
# rays per program, quarter-size epilogue temps.
set -x
cd "$(dirname "$0")/.."

echo "=== G1: use2d crossover (flat vs FORCE_2D) x ray count"
timeout 900 python scripts/bench_direct.py theater 960 540
FLEXLIGHT_FORCE_2D=1 timeout 900 python scripts/bench_direct.py theater 960 540
timeout 900 python scripts/bench_direct.py theater 1280 720
FLEXLIGHT_FORCE_2D=1 timeout 900 python scripts/bench_direct.py theater 1280 720
timeout 900 python scripts/bench_direct.py theater 1920 1080
FLEXLIGHT_FORCE_2D=1 timeout 900 python scripts/bench_direct.py theater 1920 1080
timeout 900 python scripts/bench_direct.py emissive 512 512
FLEXLIGHT_FORCE_2D=1 timeout 900 python scripts/bench_direct.py emissive 512 512
timeout 900 python scripts/bench_direct.py cornell 256 256
FLEXLIGHT_FORCE_2D=1 timeout 900 python scripts/bench_direct.py cornell 256 256

echo "=== G2: dense rt2048 x subtile4 vs rt8192 (theater 1080p, both layouts)"
FLEXLIGHT_DENSE_RAY_TILE=2048 FLEXLIGHT_DENSE_SUBTILE=4 \
  timeout 900 python scripts/bench_direct.py theater 1920 1080
FLEXLIGHT_FORCE_2D=1 FLEXLIGHT_DENSE_RAY_TILE=2048 FLEXLIGHT_DENSE_SUBTILE=4 \
  timeout 900 python scripts/bench_direct.py theater 1920 1080

echo "=== G3: north star at HEAD defaults"
timeout 2400 python bench.py

echo "=== G4: cornell 256 TAIL_SKIP runtime A/B"
FLEXLIGHT_TAIL_SKIP=2 timeout 900 python scripts/bench_direct.py cornell 256 256

echo "=== G5: theater 1080p marginal decomposition under FORCE_2D"
FLEXLIGHT_FORCE_2D=1 timeout 1800 python scripts/bench_bounce_parts.py theater 1920 1080

echo "=== G6: roofline theater + dragon; dragon HEAD sanity"
timeout 1200 python scripts/bench_direct.py dragon 1920 1080
timeout 2400 python scripts/roofline.py theater 1920 1080
timeout 2400 python scripts/roofline.py dragon 1920 1080

echo "BATCH R3G DONE"
