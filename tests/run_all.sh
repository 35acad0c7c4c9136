#!/bin/sh
# Full test run incl. multichip tests: the 8-virtual-device flag must be
# set before the interpreter starts (see tests/conftest.py).
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest "$(dirname "$0")" -q "$@"
