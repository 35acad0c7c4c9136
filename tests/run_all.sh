#!/bin/sh
# Test runner in the clean CPU env (the 8-virtual-device flag must be set
# before the interpreter starts — see tests/conftest.py).
#
#   tests/run_all.sh          fast tier (-m "not slow"), two shards
#   tests/run_all.sh --all    full suite incl. slow equivalence tests
#   tests/run_all.sh <args>   extra pytest args pass through (one process)
#
# The tier runs as TWO pytest processes (split at test_post.py): a long
# single process accumulates enough XLA:CPU compiler/allocator state
# that a late compile occasionally segfaults inside backend_compile
# (observed twice at ~78% on 2026-08-20, test_traverse sparse-soa; the
# same file passes in isolation every time). Sharding bounds per-process
# state; both shards must be green.
DIR="$(dirname "$0")"
RUN="env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -m pytest"
MARK='not slow'
if [ "$1" = "--all" ]; then
    MARK=''
    shift
fi
if [ $# -gt 0 ]; then
    exec $RUN "$DIR" -q ${MARK:+-m "$MARK"} "$@"
fi
set -e
$RUN "$DIR"/test_[a-o]*.py -q ${MARK:+-m "$MARK"}
$RUN "$DIR"/test_[p-z]*.py -q ${MARK:+-m "$MARK"}
