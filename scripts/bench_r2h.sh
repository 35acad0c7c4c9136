#!/bin/sh
# Batch H: additive per-part bounce-pipeline timings (stub ablation came
# back non-additive), theater 1080p at both dense ray tiles.
LOG=/tmp/bench_r2h.log
cd "$(dirname "$0")/.."
: > "$LOG"
while ! grep -q "BATCH G DONE" /tmp/bench_r2g.log 2>/dev/null; do sleep 30; done
run() {
    echo "=== $* ===" >> "$LOG"
    timeout 2400 env "$@" >> "$LOG" 2>&1
    echo "rc=$?" >> "$LOG"
}
run python scripts/bench_bounce_parts.py theater
run FLEXLIGHT_DENSE_RAY_TILE=8192 python scripts/bench_bounce_parts.py theater
echo "BATCH H DONE" >> "$LOG"
