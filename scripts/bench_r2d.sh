#!/bin/sh
# Round-2 session-C batch D: theater direct knobs that were staged in
# bench_all_tpu.sh but never measured before the tunnel dropped (the
# r2b table has no rows for them), plus the filter tile-height sweep.
LOG=${1:-/tmp/bench_r2d.log}
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

# theater direct: grid-step amortization + scheme alternatives
run FLEXLIGHT_DENSE_RAY_TILE=4096 python scripts/bench_direct.py theater
run FLEXLIGHT_DENSE_RAY_TILE=8192 python scripts/bench_direct.py theater
run FLEXLIGHT_SCHEME=mxu python scripts/bench_direct.py theater
run FLEXLIGHT_FORCE_2D=1 python scripts/bench_direct.py theater
# denoise chain tile-height sweep (staged in r2b, never measured)
run python scripts/bench_filters.py sweep
echo "ALL DONE" >> "$LOG"
