"""Test env: CPU backend with 8 virtual devices for multi-chip tests.

Must run before the first `import jax` anywhere in the test session.
"""

import os

# Force-assign: the ambient environment sets JAX_PLATFORMS=axon (TPU
# tunnel), which must be overridden for CPU-hosted tests. NOTE: the
# 8-virtual-device flag must be in the environment BEFORE the interpreter
# starts (the axon sitecustomize initializes XLA first); when it isn't,
# the multichip tests skip — run tests/run_all.sh for full coverage.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def fresh_transform_registry():
    """Isolate the global transform registry between tests."""
    from flexlight_tpu.scene.transform import reset_global_registry

    reset_global_registry()
    yield
    reset_global_registry()
