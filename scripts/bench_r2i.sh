#!/bin/sh
# Batch I: multi-operand lax.sort variants (payload carried through the
# sort vs argsort + lane-padded row gathers).
LOG=/tmp/bench_r2i.log
cd "$(dirname "$0")/.."
: > "$LOG"
while ! grep -q "BATCH H DONE" /tmp/bench_r2h.log 2>/dev/null; do sleep 30; done
run() {
    echo "=== $* ===" >> "$LOG"
    timeout 2400 env "$@" >> "$LOG" 2>&1
    echo "rc=$?" >> "$LOG"
}
run python scripts/bench_sort.py
echo "BATCH I DONE" >> "$LOG"
