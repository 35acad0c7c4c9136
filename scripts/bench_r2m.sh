#!/bin/sh
# Batch M: clean (uncontended) dragon sparse-SoA A/B — batch K's runs
# were double-scheduled by a stale waiter and contended the chip — plus
# the adaptive dense ray-tile default check (cornell-256 + north star).
LOG=/tmp/bench_r2m.log
cd "$(dirname "$0")/.."
: > "$LOG"
while ! grep -q "BATCH L DONE" /tmp/bench_r2l.log 2>/dev/null; do sleep 30; done
run() {
    echo "=== $* ===" >> "$LOG"
    timeout 2400 env "$@" >> "$LOG" 2>&1
    echo "rc=$?" >> "$LOG"
}
run FLEXLIGHT_SPARSE_SOA=0 python scripts/bench_direct.py dragon
run FLEXLIGHT_SPARSE_SOA=1 python scripts/bench_direct.py dragon
run FLEXLIGHT_SPARSE_SOA=1 FLEXLIGHT_SPARSE_SUBTILE=4 python scripts/bench_direct.py dragon
run python scripts/bench_direct.py theater
run FLEXLIGHT_DENSE_RAY_TILE=16384 python scripts/bench_direct.py theater
run FLEXLIGHT_DENSE_RAY_TILE=32768 python scripts/bench_direct.py theater
run FLEXLIGHT_DENSE_RAY_TILE=65536 python scripts/bench_direct.py theater
run python scripts/bench_stages.py theater
run python bench.py
echo "BATCH M DONE" >> "$LOG"
