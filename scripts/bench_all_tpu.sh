#!/bin/sh
# Serial device-side perf sweep (run on the TPU, nothing else on the chip).
# Usage: scripts/bench_all_tpu.sh [logfile]
#
# Device-sharing protocol: the relay serializes concurrent TPU processes
# and inflates device timings 2-3x, so (a) this sweep advertises itself
# via /tmp/tpu_sweep.lock (bench.py waits on it), and (b) it YIELDS
# between entries when bench.py signals priority via /tmp/bench_priority
# (the driver's round-end benchmark must never record confounded
# numbers).
LOG=${1:-/tmp/bench_all.log}
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
        rm -f /tmp/bench_priority    # stale flag from a dead bench.py
    fi
}

# run [NAME=value ...] script args...   (env assignments optional)
run() {
    yield_check
    echo "=== $* ===" >> "$LOG"
    timeout 2400 env "$@" >> "$LOG" 2>&1
    echo "rc=$?" >> "$LOG"
}

run python scripts/bench_direct.py theater
run FLEXLIGHT_SCHEME=mxu python scripts/bench_direct.py theater
run FLEXLIGHT_DENSE_RAY_TILE=4096 python scripts/bench_direct.py theater
run FLEXLIGHT_FORCE_2D=1 python scripts/bench_direct.py theater
run python scripts/bench_direct.py dragon
run FLEXLIGHT_BOUNCE_RT=512 python scripts/bench_direct.py dragon
run FLEXLIGHT_SPARSE_SORT=nearest2 python scripts/bench_direct.py dragon
run FLEXLIGHT_SPARSE_SORT=nearest2 FLEXLIGHT_BOUNCE_RT=512 python scripts/bench_direct.py dragon
run FLEXLIGHT_SPARSE_SORT=nearest2 FLEXLIGHT_BOUNCE_RT=256 python scripts/bench_direct.py dragon
run FLEXLIGHT_SPARSE_SORT=nearest2 FLEXLIGHT_BOUNCE_RT=256 FLEXLIGHT_SPARSE_SUBTILE=4 python scripts/bench_direct.py dragon
run FLEXLIGHT_SHADE_KERNEL=1 python scripts/bench_direct.py dragon
run FLEXLIGHT_SHADE_KERNEL=1 FLEXLIGHT_FORCE_2D=1 python scripts/bench_direct.py theater
run python scripts/bench_direct.py wave
run FLEXLIGHT_SCHEME=fused python scripts/bench_direct.py wave
run FLEXLIGHT_SCHEME=fused_split python scripts/bench_direct.py theater
run FLEXLIGHT_SCHEME=fused_split FLEXLIGHT_SPLIT_RAY_TILE=4096 python scripts/bench_direct.py theater
run FLEXLIGHT_SCHEME=fused_split python scripts/bench_direct.py cornell
run FLEXLIGHT_SCHEME=fused_split python scripts/bench_direct.py obj 1280 720
run FLEXLIGHT_SCHEME=fused_split python scripts/bench_direct.py emissive 512 512
run python scripts/bench_ablate.py theater
run python scripts/bench_ablate.py dragon
run python scripts/bench_stages.py theater
run FLEXLIGHT_FXAA=gather python scripts/bench_stages.py theater
run python scripts/bench_filters.py
run python scripts/bench_filters.py sweep
run python scripts/bench_sort.py
run FLEXLIGHT_SWEEP_CHILD=1 python bench.py
echo "ALL DONE" >> "$LOG"
