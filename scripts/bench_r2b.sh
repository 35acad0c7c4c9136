#!/bin/sh
# Round-2 session-B targeted sweep: entries that crashed in the previous
# chip sweep before the fused-family Mosaic fix (0039c1e) plus the
# pending filter tile-height sweep. Same device-sharing protocol as
# scripts/bench_all_tpu.sh.
LOG=${1:-/tmp/bench_r2b.log}
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

# fused family at HEAD (post-0039c1e)
run FLEXLIGHT_SCHEME=fused_split python scripts/bench_direct.py theater
run FLEXLIGHT_SCHEME=fused_split FLEXLIGHT_SPLIT_RAY_TILE=4096 python scripts/bench_direct.py theater
run FLEXLIGHT_SCHEME=fused_split python scripts/bench_direct.py cornell
run FLEXLIGHT_SCHEME=fused_split python scripts/bench_direct.py obj 1280 720
run FLEXLIGHT_SCHEME=fused_split python scripts/bench_direct.py emissive 512 512
run FLEXLIGHT_SCHEME=fused python scripts/bench_direct.py wave
# shade kernel at HEAD
run FLEXLIGHT_SHADE_KERNEL=1 python scripts/bench_direct.py dragon
run FLEXLIGHT_SHADE_KERNEL=1 python scripts/bench_direct.py theater
# current HEAD baselines (compact atlas tables affect both)
run python scripts/bench_direct.py theater
run python scripts/bench_direct.py dragon
run FLEXLIGHT_SPARSE_SORT=nearest2 python scripts/bench_direct.py dragon
# denoise chain: timing + tile-height sweep
run python scripts/bench_filters.py
run python scripts/bench_filters.py sweep
echo "ALL DONE" >> "$LOG"
