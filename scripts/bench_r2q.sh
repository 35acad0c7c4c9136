#!/bin/sh
# Batch Q: dragon bounce ray-tile x subtile cross — small ray tiles
# tighten candidate unions (captured wavefronts: 59.3 -> 43.0 live
# tiles at 512) but were only chip-tested at low subtile counts where
# the program count exploded; G compensates (programs = N/(rt*G)).
LOG=/tmp/bench_r2q.log
cd "$(dirname "$0")/.."
: > "$LOG"
while ! grep -q "BATCH P DONE" /tmp/bench_all_r2p.log 2>/dev/null; do sleep 30; done
run() {
    echo "=== $* ===" >> "$LOG"
    timeout 2400 env "$@" >> "$LOG" 2>&1
    echo "rc=$?" >> "$LOG"
}
run python scripts/bench_direct.py obj 1280 720
run FLEXLIGHT_BOUNCE_RT=512 FLEXLIGHT_SPARSE_SUBTILE=8 python scripts/bench_direct.py dragon
run FLEXLIGHT_BOUNCE_RT=256 FLEXLIGHT_SPARSE_SUBTILE=16 python scripts/bench_direct.py dragon
run FLEXLIGHT_BOUNCE_RT=512 FLEXLIGHT_SPARSE_SUBTILE=4 python scripts/bench_direct.py dragon
run FLEXLIGHT_BOUNCE_RT=256 FLEXLIGHT_SPARSE_SUBTILE=8 python scripts/bench_direct.py dragon
echo "BATCH Q DONE" >> "$LOG"
