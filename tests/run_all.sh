#!/bin/sh
# Test runner in the clean CPU env (the 8-virtual-device flag must be set
# before the interpreter starts — see tests/conftest.py).
#
#   tests/run_all.sh          fast tier (-m "not slow"), ~5 min on CPU
#   tests/run_all.sh --all    full suite incl. slow equivalence tests (~25 min)
#   tests/run_all.sh <args>   extra pytest args pass through
MARK='-m not slow'
if [ "$1" = "--all" ]; then
    MARK=''
    shift
fi
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest "$(dirname "$0")" -q ${MARK:+-m "not slow"} "$@"
