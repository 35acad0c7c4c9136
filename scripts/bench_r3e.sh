#!/bin/sh
# Round-3 batch E: dead-tail bounce skip A/B (lax.cond on any-alive)
# across the BASELINE scenes, at the round-3 dense defaults.
set -x
cd "$(dirname "$0")/.."

echo "=== BATCH E1: theater 1080p direct, TAIL_SKIP off/on x FORCE_2D"
FLEXLIGHT_TAIL_SKIP=0 timeout 900 python scripts/bench_direct.py theater 1920 1080
timeout 900 python scripts/bench_direct.py theater 1920 1080
FLEXLIGHT_FORCE_2D=1 FLEXLIGHT_TAIL_SKIP=0 timeout 900 python scripts/bench_direct.py theater 1920 1080
FLEXLIGHT_FORCE_2D=1 timeout 900 python scripts/bench_direct.py theater 1920 1080

echo "=== BATCH E2: dragon 1080p direct, TAIL_SKIP off/on"
FLEXLIGHT_TAIL_SKIP=0 timeout 1200 python scripts/bench_direct.py dragon 1920 1080
timeout 1200 python scripts/bench_direct.py dragon 1920 1080

echo "=== BATCH E3: cornell 256 + emissive 512, TAIL_SKIP off/on"
FLEXLIGHT_TAIL_SKIP=0 timeout 900 python scripts/bench_direct.py cornell 256 256
timeout 900 python scripts/bench_direct.py cornell 256 256
FLEXLIGHT_TAIL_SKIP=0 timeout 900 python scripts/bench_direct.py emissive 512 512
timeout 900 python scripts/bench_direct.py emissive 512 512

echo "=== BATCH E4: north star at HEAD defaults"
timeout 1800 python bench.py

echo "BATCH R3E DONE"
