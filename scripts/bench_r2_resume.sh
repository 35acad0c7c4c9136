#!/bin/sh
# Resume the round-2 chip batch chain after the session restart killed it.
# G was mid-sweep; re-run its sweep remnant, then mark G done so the
# H -> I -> J -> K waiters (started here) drain in order.
cd "$(dirname "$0")/.."
LOG=/tmp/bench_r2g.log
run() {
    echo "=== $* ===" >> "$LOG"
    timeout 2400 env "$@" >> "$LOG" 2>&1
    echo "rc=$?" >> "$LOG"
}
run FLEXLIGHT_FILTER_COMPACT=1 python scripts/bench_filters.py sweep
run python bench.py
echo "BATCH G DONE" >> "$LOG"
sh scripts/bench_r2h.sh
sh scripts/bench_r2i.sh
sh scripts/bench_r2j.sh
sh scripts/bench_r2k.sh
echo "CHAIN DONE" >> /tmp/bench_r2_chain.log
