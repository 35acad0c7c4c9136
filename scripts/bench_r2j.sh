#!/bin/sh
# Batch J: SoA-native cast A/B (theater 1080p direct) x dense ray tile.
LOG=/tmp/bench_r2j.log
cd "$(dirname "$0")/.."
: > "$LOG"
while ! grep -q "BATCH I DONE" /tmp/bench_r2i.log 2>/dev/null; do sleep 30; done
run() {
    echo "=== $* ===" >> "$LOG"
    timeout 2400 env "$@" >> "$LOG" 2>&1
    echo "rc=$?" >> "$LOG"
}
run FLEXLIGHT_SOA_CAST=0 python scripts/bench_direct.py theater
run FLEXLIGHT_SOA_CAST=1 python scripts/bench_direct.py theater
run FLEXLIGHT_SOA_CAST=0 FLEXLIGHT_DENSE_RAY_TILE=8192 python scripts/bench_direct.py theater
run FLEXLIGHT_SOA_CAST=1 FLEXLIGHT_DENSE_RAY_TILE=8192 python scripts/bench_direct.py theater
run FLEXLIGHT_SOA_CAST=1 FLEXLIGHT_DENSE_RAY_TILE=8192 python scripts/bench_direct.py cornell
echo "BATCH J DONE" >> "$LOG"
