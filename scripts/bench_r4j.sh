#!/bin/sh
# Round-4 batch J: filter tx sweep (wider tiles cut the per-program floor).
set -x
cd "$(dirname "$0")/.."
echo "=== J1: fast chain tx variants"
timeout 2400 python scripts/bench_fastchain.py theater 1920 1080
echo "BATCH R4J DONE"
