#!/bin/sh
# Batch P: refresh the full BASELINE config sweep at HEAD (all round-2
# defaults: SoA casts, adaptive dense ray tile, sparse SoA carry-sort +
# subtile 4, filter compaction + ty=32 first filter).
cd "$(dirname "$0")/.."
while ! grep -q "BATCH O DONE" /tmp/bench_r2o.log 2>/dev/null; do sleep 30; done
sh scripts/bench_all_tpu.sh /tmp/bench_all_r2p.log
echo "BATCH P DONE" >> /tmp/bench_all_r2p.log
