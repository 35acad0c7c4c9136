#!/bin/sh
# Round-4 batch H: fast-chain variant sweep (unbanded second/final +
# tile-height cross) on real theater inputs.
set -x
cd "$(dirname "$0")/.."
echo "=== H1: fast chain variants (theater 1080p)"
timeout 2400 python scripts/bench_fastchain.py theater 1920 1080
echo "BATCH R4H DONE"
