#!/bin/sh
# Batch P (focused): refresh ONLY the five BASELINE configs at HEAD
# defaults — the full bench_all_tpu sweep re-runs documented losers and
# takes hours; the A/B history already lives in docs/PERF.md.
LOG=/tmp/bench_all_r2p.log
cd "$(dirname "$0")/.."
: > "$LOG"
run() {
    echo "=== $* ===" >> "$LOG"
    timeout 2400 env "$@" >> "$LOG" 2>&1
    echo "rc=$?" >> "$LOG"
}
run python scripts/bench_direct.py cornell 256 256
run python scripts/bench_direct.py emissive 512 512
run python scripts/bench_direct.py obj 1280 720
run python scripts/bench_direct.py dragon
run python scripts/bench_e2e.py cornell
echo "BATCH P DONE" >> "$LOG"
