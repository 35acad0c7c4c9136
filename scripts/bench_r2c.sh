#!/bin/sh
# Round-2 session-B batch C: A/B the merged shadow+bounce pair cast and
# the packed vote repair (both landed after bench_r2b ran), plus clean
# per-stage attribution at HEAD.
LOG=${1:-/tmp/bench_r2c.log}
cd "$(dirname "$0")/.."
: > "$LOG"
echo $$ > /tmp/tpu_sweep.lock
trap 'rm -f /tmp/tpu_sweep.lock' EXIT

yield_check() {
    if [ -f /tmp/bench_priority ]; then
        BPID=$(cat /tmp/bench_priority 2>/dev/null)
        if [ -n "$BPID" ] && kill -0 "$BPID" 2>/dev/null; then
            echo "bench.py (pid $BPID) holds priority - sweep yielding" >> "$LOG"
            rm -f /tmp/tpu_sweep.lock
            exit 0
        fi
        rm -f /tmp/bench_priority
    fi
}

run() {
    yield_check
    echo "=== $* ===" >> "$LOG"
    timeout 2400 env "$@" >> "$LOG" 2>&1
    echo "rc=$?" >> "$LOG"
}

# pair cast (now default on sparse) + packed vote repair at HEAD
run python scripts/bench_direct.py dragon
run FLEXLIGHT_PAIR_CAST=0 python scripts/bench_direct.py dragon
run python scripts/bench_filters.py
run python scripts/bench_stages.py theater
# per-stage attribution at HEAD
run python scripts/bench_ablate.py dragon
run python scripts/bench_ablate.py theater
run python scripts/bench_sort.py
echo "ALL DONE" >> "$LOG"
