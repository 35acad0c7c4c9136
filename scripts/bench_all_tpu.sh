#!/bin/sh
# Serial device-side perf sweep (run on the TPU, nothing else on the chip).
# Usage: scripts/bench_all_tpu.sh [logfile]
LOG=${1:-/tmp/bench_all.log}
cd "$(dirname "$0")/.."
: > "$LOG"
run() {
    echo "=== $* ===" >> "$LOG"
    timeout 2400 python "$@" >> "$LOG" 2>&1
    echo "rc=$?" >> "$LOG"
}
run scripts/bench_direct.py theater
echo "=== FLEXLIGHT_SCHEME=mxu bench_direct theater (no-Pallas traversal A/B) ===" >> "$LOG"
timeout 2400 env FLEXLIGHT_SCHEME=mxu python scripts/bench_direct.py theater >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "=== FLEXLIGHT_DENSE_RAY_TILE=4096 bench_direct theater ===" >> "$LOG"
timeout 2400 env FLEXLIGHT_DENSE_RAY_TILE=4096 python scripts/bench_direct.py theater >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "=== FLEXLIGHT_FORCE_2D=1 bench_direct theater ===" >> "$LOG"
timeout 2400 env FLEXLIGHT_FORCE_2D=1 python scripts/bench_direct.py theater >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
run scripts/bench_direct.py dragon
echo "=== FLEXLIGHT_BOUNCE_RT=512 bench_direct dragon ===" >> "$LOG"
timeout 2400 env FLEXLIGHT_BOUNCE_RT=512 python scripts/bench_direct.py dragon >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "=== FLEXLIGHT_SPARSE_SORT=nearest2 bench_direct dragon (candidate-aware wavefront sort) ===" >> "$LOG"
timeout 2400 env FLEXLIGHT_SPARSE_SORT=nearest2 python scripts/bench_direct.py dragon >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "=== FLEXLIGHT_SPARSE_SORT=nearest2 FLEXLIGHT_BOUNCE_RT=512 bench_direct dragon ===" >> "$LOG"
timeout 2400 env FLEXLIGHT_SPARSE_SORT=nearest2 FLEXLIGHT_BOUNCE_RT=512 python scripts/bench_direct.py dragon >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "=== FLEXLIGHT_SPARSE_SORT=nearest2 FLEXLIGHT_BOUNCE_RT=256 bench_direct dragon ===" >> "$LOG"
timeout 2400 env FLEXLIGHT_SPARSE_SORT=nearest2 FLEXLIGHT_BOUNCE_RT=256 python scripts/bench_direct.py dragon >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "=== FLEXLIGHT_SPARSE_SORT=nearest2 FLEXLIGHT_BOUNCE_RT=256 FLEXLIGHT_SPARSE_SUBTILE=4 bench_direct dragon (subtiled small ray tiles) ===" >> "$LOG"
timeout 2400 env FLEXLIGHT_SPARSE_SORT=nearest2 FLEXLIGHT_BOUNCE_RT=256 FLEXLIGHT_SPARSE_SUBTILE=4 python scripts/bench_direct.py dragon >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "=== FLEXLIGHT_SHADE_KERNEL=1 bench_direct dragon (Pallas shading + sparse traversal) ===" >> "$LOG"
timeout 2400 env FLEXLIGHT_SHADE_KERNEL=1 python scripts/bench_direct.py dragon >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "=== FLEXLIGHT_SHADE_KERNEL=1 FLEXLIGHT_FORCE_2D=1 bench_direct theater (shading-cost calibration) ===" >> "$LOG"
timeout 2400 env FLEXLIGHT_SHADE_KERNEL=1 FLEXLIGHT_FORCE_2D=1 python scripts/bench_direct.py theater >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
run scripts/bench_direct.py wave
echo "=== FLEXLIGHT_SCHEME=fused bench_direct wave (whole-frame fused kernel A/B) ===" >> "$LOG"
timeout 2400 env FLEXLIGHT_SCHEME=fused python scripts/bench_direct.py wave >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "=== FLEXLIGHT_SCHEME=fused_split bench_direct theater (per-bounce split pipeline A/B) ===" >> "$LOG"
timeout 2400 env FLEXLIGHT_SCHEME=fused_split python scripts/bench_direct.py theater >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "=== FLEXLIGHT_SCHEME=fused_split FLEXLIGHT_SPLIT_RAY_TILE=4096 bench_direct theater ===" >> "$LOG"
timeout 2400 env FLEXLIGHT_SCHEME=fused_split FLEXLIGHT_SPLIT_RAY_TILE=4096 python scripts/bench_direct.py theater >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "=== FLEXLIGHT_SCHEME=fused_split bench_direct cornell (1080p) ===" >> "$LOG"
timeout 2400 env FLEXLIGHT_SCHEME=fused_split python scripts/bench_direct.py cornell >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "=== FLEXLIGHT_SCHEME=fused_split bench_direct obj (720p) ===" >> "$LOG"
timeout 2400 env FLEXLIGHT_SCHEME=fused_split python scripts/bench_direct.py obj 1280 720 >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "=== FLEXLIGHT_SCHEME=fused_split bench_direct emissive (512) ===" >> "$LOG"
timeout 2400 env FLEXLIGHT_SCHEME=fused_split python scripts/bench_direct.py emissive 512 512 >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
run scripts/bench_ablate.py theater
run scripts/bench_ablate.py dragon
run scripts/bench_stages.py theater
echo "=== FLEXLIGHT_FXAA=gather bench_stages theater (kernel-vs-XLA FXAA A/B) ===" >> "$LOG"
timeout 2400 env FLEXLIGHT_FXAA=gather python scripts/bench_stages.py theater >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
run scripts/bench_filters.py
run scripts/bench_filters.py sweep
run bench.py
echo "ALL DONE" >> "$LOG"
