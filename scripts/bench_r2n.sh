#!/bin/sh
# Batch N: corrected frame decomposition (all MRT channels consumed —
# the first run DCE'd the id-packing chains) on theater + dragon.
LOG=/tmp/bench_r2n.log
cd "$(dirname "$0")/.."
: > "$LOG"
while ! grep -q "BATCH M DONE" /tmp/bench_r2m.log 2>/dev/null; do sleep 30; done
run() {
    echo "=== $* ===" >> "$LOG"
    timeout 3000 env "$@" >> "$LOG" 2>&1
    echo "rc=$?" >> "$LOG"
}
run python scripts/bench_stages.py theater
run FLEXLIGHT_DENSE_RAY_TILE=16384 python scripts/bench_direct.py theater
run FLEXLIGHT_DENSE_RAY_TILE=32768 python scripts/bench_direct.py theater
run FLEXLIGHT_DENSE_RAY_TILE=65536 python scripts/bench_direct.py theater
run FLEXLIGHT_SPARSE_SOA=1 FLEXLIGHT_SPARSE_SUBTILE=8 python scripts/bench_direct.py dragon
run FLEXLIGHT_SPARSE_SOA=1 FLEXLIGHT_SPARSE_SUBTILE=16 python scripts/bench_direct.py dragon
run python scripts/bench_bounce_parts.py theater
run python scripts/bench_bounce_parts.py dragon
echo "BATCH N DONE" >> "$LOG"
