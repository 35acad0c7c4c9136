#!/bin/sh
# Round-3 batch F (supersedes the aborted batch E run):
#  - TAIL_SKIP default reverted to 0 after the theater-1080p cond compile
#    blew the 900 s timeout (batch E1, 2026-08-20); one cheap cornell
#    runtime A/B documents the small-scene effect.
#  - use2d crossover on small-table scenes across ray counts (batch C
#    showed 2-D wins at theater-1080p; obj's FORCE_2D delta was a no-op —
#    its >256-row table already takes the 2-D path).
#  - FORCE_2D whole-frame marginal decomposition (what the 2-D layout
#    does to the per-bounce budget).
#  - roofline + dragon HEAD sanity + north star (batch D's dead entries).
set -x
cd "$(dirname "$0")/.."

echo "=== BATCH F0: cornell 256 TAIL_SKIP runtime A/B (compile is cheap here)"
timeout 900 python scripts/bench_direct.py cornell 256 256
FLEXLIGHT_TAIL_SKIP=2 timeout 900 python scripts/bench_direct.py cornell 256 256

echo "=== BATCH F1: use2d crossover (flat vs FORCE_2D) x ray count"
FLEXLIGHT_FORCE_2D=1 timeout 900 python scripts/bench_direct.py cornell 256 256
timeout 900 python scripts/bench_direct.py emissive 512 512
FLEXLIGHT_FORCE_2D=1 timeout 900 python scripts/bench_direct.py emissive 512 512
timeout 900 python scripts/bench_direct.py theater 960 540
FLEXLIGHT_FORCE_2D=1 timeout 900 python scripts/bench_direct.py theater 960 540
timeout 900 python scripts/bench_direct.py theater 1280 720
FLEXLIGHT_FORCE_2D=1 timeout 900 python scripts/bench_direct.py theater 1280 720
timeout 900 python scripts/bench_direct.py theater 1920 1080
FLEXLIGHT_FORCE_2D=1 timeout 900 python scripts/bench_direct.py theater 1920 1080

echo "=== BATCH F2: theater 1080p marginal decomposition under FORCE_2D"
FLEXLIGHT_FORCE_2D=1 timeout 1800 python scripts/bench_bounce_parts.py theater 1920 1080

echo "=== BATCH F3: roofline theater + dragon; dragon HEAD sanity"
timeout 2400 python scripts/roofline.py theater 1920 1080
timeout 2400 python scripts/roofline.py dragon 1920 1080
timeout 1200 python scripts/bench_direct.py dragon 1920 1080

echo "=== BATCH F4: north star at HEAD defaults"
timeout 2400 python bench.py

echo "BATCH R3F DONE"
