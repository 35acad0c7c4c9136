#!/bin/sh
# Round-4 batch E: real fast-chain per-pass attribution (item 4).
set -x
cd "$(dirname "$0")/.."
echo "=== E1: fast chain per-pass (theater 1080p)"
timeout 1800 python scripts/bench_fastchain.py theater 1920 1080
echo "BATCH R4E DONE"
