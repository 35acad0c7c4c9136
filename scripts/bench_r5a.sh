#!/bin/sh
# Round-5 batch A: tex-stage fix (moveaxis removal), dead-subtile skip,
# unsorted primaries + prefetch-ahead + dead-flag masks (dragon), recovery
# variants, filter realign share.
set -x
cd "$(dirname "$0")/.."
echo "=== A1: recovery variants (dragon w4f)"
timeout 2400 python scripts/bench_recovery.py 8
echo "=== A2: theater 1080p direct (tex fix + skip)"
timeout 1800 python scripts/bench_direct.py theater 1920 1080 4
echo "=== A3: theater stub=dma (tex stage isolation re-check)"
FLEXLIGHT_SPLIT_STUB=dma timeout 1800 python scripts/bench_direct.py theater 1920 1080 4
echo "=== A4: dragon 1080p direct (unsorted primary + prefetch + dead flags)"
timeout 2400 python scripts/bench_direct.py dragon 1920 1080 3
echo "=== A5: dragon control (sorted primary)"
FLEXLIGHT_SPARSE_SORT_PRIMARY=1 timeout 2400 python scripts/bench_direct.py dragon 1920 1080 3
echo "=== A6: filter io + realign share"
timeout 2400 python scripts/bench_filter_io.py 8
echo "BATCH R5A DONE"
