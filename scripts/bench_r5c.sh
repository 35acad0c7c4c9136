#!/bin/sh
# Round-5 batch C: dragon regression bisect (A4: 760 -> 1054 after the
# round-5 sparse changes) + theater slice-first tex A/B.
set -x
cd "$(dirname "$0")/.."
echo "=== C1: dragon control (all round-5 changes)"
timeout 2400 python scripts/bench_direct.py dragon 1920 1080 3
echo "=== C2: dragon PREFETCH=0"
FLEXLIGHT_SPARSE_PREFETCH=0 timeout 2400 python scripts/bench_direct.py dragon 1920 1080 3
echo "=== C3: dragon RECOVERY=legacy"
FLEXLIGHT_SPARSE_RECOVERY=legacy timeout 2400 python scripts/bench_direct.py dragon 1920 1080 3
echo "=== C4: dragon DEADSKIP=0"
FLEXLIGHT_SPARSE_DEADSKIP=0 timeout 2400 python scripts/bench_direct.py dragon 1920 1080 3
echo "=== C5: dragon PREFETCH=0 RECOVERY=legacy DEADSKIP=0 (old code + unsorted primary + ml>0 flags)"
FLEXLIGHT_SPARSE_PREFETCH=0 FLEXLIGHT_SPARSE_RECOVERY=legacy FLEXLIGHT_SPARSE_DEADSKIP=0 timeout 2400 python scripts/bench_direct.py dragon 1920 1080 3
echo "=== C6: theater direct (slice-first tex)"
timeout 1800 python scripts/bench_direct.py theater 1920 1080 4
echo "=== C7: theater direct TEX_PAD4"
FLEXLIGHT_TEX_PAD4=1 timeout 1800 python scripts/bench_direct.py theater 1920 1080 4
echo "=== C8: theater full-pipeline stages (packed chain default)"
timeout 2400 python scripts/bench_stages.py theater 1920 1080
echo "=== C9: theater stages OFFSET_WHEN=0"
FLEXLIGHT_FILTER_OFFSET_WHEN=0 timeout 2400 python scripts/bench_stages.py theater 1920 1080
echo "BATCH R5C DONE"
