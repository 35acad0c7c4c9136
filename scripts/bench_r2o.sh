#!/bin/sh
# Batch O: real-frame filter pass costs at 1080p (theater keys are
# per-pixel noisy -> full per-tile scale spread; synthetic mixed was
# far too optimistic) + dragon for contrast.
LOG=/tmp/bench_r2o.log
cd "$(dirname "$0")/.."
: > "$LOG"
while ! grep -q "BATCH N DONE" /tmp/bench_r2n.log 2>/dev/null; do sleep 30; done
run() {
    echo "=== $* ===" >> "$LOG"
    timeout 3000 env "$@" >> "$LOG" 2>&1
    echo "rc=$?" >> "$LOG"
}
run python scripts/bench_filters_real.py theater
run python scripts/bench_filters_real.py dragon
echo "BATCH O DONE" >> "$LOG"
