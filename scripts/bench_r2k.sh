#!/bin/sh
# Batch K: SoA sparse-cast A/B (carry-sort wavefronts) on dragon +
# extended filter ty sweep (second/final) + north-star bench at HEAD.
LOG=/tmp/bench_r2k.log
cd "$(dirname "$0")/.."
: > "$LOG"
while ! grep -q "BATCH J DONE" /tmp/bench_r2j.log 2>/dev/null; do sleep 30; done
run() {
    echo "=== $* ===" >> "$LOG"
    timeout 2400 env "$@" >> "$LOG" 2>&1
    echo "rc=$?" >> "$LOG"
}
run FLEXLIGHT_SPARSE_SOA=0 python scripts/bench_direct.py dragon
run FLEXLIGHT_SPARSE_SOA=1 python scripts/bench_direct.py dragon
run FLEXLIGHT_SPARSE_SOA=1 FLEXLIGHT_SPARSE_SUBTILE=4 python scripts/bench_direct.py dragon
run python scripts/bench_filters.py sweep
run python bench.py
echo "BATCH K DONE" >> "$LOG"
