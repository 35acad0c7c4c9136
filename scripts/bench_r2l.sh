#!/bin/sh
# Batch L: whole-frame marginal bounce decomposition (frame at
# max_reflections 0/1/2/3/5 -> slope = true per-bounce cost, intercept
# = camera+primary+MRT pack) + isolated apply/nextdir stage; theater at
# both dense ray tiles, then cornell-256 scale.
LOG=/tmp/bench_r2l.log
cd "$(dirname "$0")/.."
: > "$LOG"
while ! grep -q "BATCH K DONE" /tmp/bench_r2k.log 2>/dev/null; do sleep 30; done
run() {
    echo "=== $* ===" >> "$LOG"
    timeout 2400 env "$@" >> "$LOG" 2>&1
    echo "rc=$?" >> "$LOG"
}
run python scripts/bench_bounce_parts.py theater
run FLEXLIGHT_DENSE_RAY_TILE=8192 python scripts/bench_bounce_parts.py theater
run FLEXLIGHT_DENSE_RAY_TILE=8192 python scripts/bench_bounce_parts.py cornell 256 256
run python scripts/bench_bounce_parts.py dragon
echo "BATCH L DONE" >> "$LOG"
