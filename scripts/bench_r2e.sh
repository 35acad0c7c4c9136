#!/bin/sh
# Batch E: waits for batch D (ANATOMY DONE marker), then sort microbench
# + direct-frame stage attribution for theater and dragon.
LOG=/tmp/bench_r2e.log
cd /root/repo
: > "$LOG"
while ! grep -q "ANATOMY DONE" /tmp/bench_r2d.log 2>/dev/null; do sleep 30; done
run() {
    echo "=== $* ===" >> "$LOG"
    timeout 2400 env "$@" >> "$LOG" 2>&1
    echo "rc=$?" >> "$LOG"
}
run python scripts/bench_sort.py
run python scripts/bench_ablate.py theater
run python scripts/bench_ablate.py dragon
echo "BATCH E DONE" >> "$LOG"
