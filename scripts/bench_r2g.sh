#!/bin/sh
# Batch G: filter active-tile compaction A/B on chip (synthetic 1080p
# kernels, compact on/off, tile-height sweep under compaction) + the
# north-star full-pipeline bench at HEAD.
LOG=${1:-/tmp/bench_r2g.log}
cd "$(dirname "$0")/.."
: > "$LOG"
while ! grep -q "BATCH F DONE" /tmp/bench_r2f.log 2>/dev/null; do sleep 30; done
run() {
    echo "=== $* ===" >> "$LOG"
    timeout 2400 env "$@" >> "$LOG" 2>&1
    echo "rc=$?" >> "$LOG"
}
run FLEXLIGHT_FILTER_COMPACT=1 python scripts/bench_filters.py
run FLEXLIGHT_FILTER_COMPACT=0 python scripts/bench_filters.py
run FLEXLIGHT_FILTER_COMPACT=1 python scripts/bench_filters.py sweep
run python bench.py
echo "BATCH G DONE" >> "$LOG"
