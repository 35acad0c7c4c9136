#!/bin/sh
# Round-5 batch D: consolidated post-bisect runs (legacy recovery default).
set -x
cd "$(dirname "$0")/.."
echo "=== D1: dragon direct HEAD defaults"
timeout 2400 python scripts/bench_direct.py dragon 1920 1080 3
echo "=== D2: dragon DEADSKIP=0"
FLEXLIGHT_SPARSE_DEADSKIP=0 timeout 2400 python scripts/bench_direct.py dragon 1920 1080 3
echo "=== D3: dragon PREFETCH=0"
FLEXLIGHT_SPARSE_PREFETCH=0 timeout 2400 python scripts/bench_direct.py dragon 1920 1080 3
echo "=== D4: theater direct (slice-first tex)"
timeout 1800 python scripts/bench_direct.py theater 1920 1080 4
echo "=== D5: theater direct TEX_PAD4=1"
FLEXLIGHT_TEX_PAD4=1 timeout 1800 python scripts/bench_direct.py theater 1920 1080 4
echo "=== D6: theater full stages (packed chain)"
timeout 2400 python scripts/bench_stages.py theater 1920 1080
echo "=== D7: theater stages OFFSET_WHEN=0"
FLEXLIGHT_FILTER_OFFSET_WHEN=0 timeout 2400 python scripts/bench_stages.py theater 1920 1080
echo "=== D8: bike 1080p kernel vs fused_split"
timeout 2400 python scripts/bench_direct.py bike 1920 1080 3
FLEXLIGHT_SCHEME=fused_split timeout 2400 python scripts/bench_direct.py bike 1920 1080 3
echo "=== D14: theater stages FILTER_TY=64"
FLEXLIGHT_FILTER_TY=64 timeout 2400 python scripts/bench_stages.py theater 1920 1080
echo "=== D12: dragon BOUNCE_RT=512 SUBTILE=16 (union shrink at const programs)"
FLEXLIGHT_BOUNCE_RT=512 FLEXLIGHT_SPARSE_SUBTILE=16 timeout 2400 python scripts/bench_direct.py dragon 1920 1080 3
echo "=== D15: dragon mr sweep (marginal decomposition)"
timeout 1800 python scripts/bench_direct.py dragon 1920 1080 3 0
timeout 1800 python scripts/bench_direct.py dragon 1920 1080 3 1
timeout 1800 python scripts/bench_direct.py dragon 1920 1080 3 3
echo "=== D9: latency depths"
timeout 1800 python scripts/bench_latency.py cornell 256 8
echo "=== D10: bench.py"
timeout 3600 python bench.py
echo "=== D11: cold/warm compile"
timeout 3600 python scripts/bench_cold_compile.py cold
timeout 1200 python scripts/bench_cold_compile.py warm
echo "BATCH R5D DONE"
