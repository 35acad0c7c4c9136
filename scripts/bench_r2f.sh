#!/bin/sh
# Batch F: corrected theater shade-kernel A/B (r2b ran it without
# FORCE_2D, so use2d was False and the kernel never engaged).
LOG=/tmp/bench_r2f.log
cd /root/repo
: > "$LOG"
while ! grep -q "BATCH E DONE" /tmp/bench_r2e.log 2>/dev/null; do sleep 30; done
run() {
    echo "=== $* ===" >> "$LOG"
    timeout 2400 env "$@" >> "$LOG" 2>&1
    echo "rc=$?" >> "$LOG"
}
run FLEXLIGHT_SHADE_KERNEL=1 FLEXLIGHT_FORCE_2D=1 python scripts/bench_direct.py theater
echo "BATCH F DONE" >> "$LOG"
