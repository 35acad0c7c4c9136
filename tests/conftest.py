"""Test env: CPU backend with 8 virtual devices for multi-chip tests.

Must run before the first `import jax` anywhere in the test session.

The ambient environment sets PALLAS_AXON_POOL_IPS, which makes the axon
sitecustomize register AND eagerly initialize the TPU-tunnel backend at
interpreter start — before this file runs, with JAX_PLATFORMS=axon
already baked into jax.config. Env-var reassignment alone cannot undo
that (jax read the env at import), so we flip the live config value and
drop the initialized backend cache; the CPU client is then created fresh
and honors the 8-virtual-device XLA flag.
"""

import os

# Env assignments still matter for any subprocesses tests spawn, and for
# the clean-env case where jax has not been imported yet.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if getattr(jax._src.xla_bridge, "_backends", None):
    # sitecustomize already initialized the axon backend; drop the cache
    # so the next jax.devices() builds the 8-device CPU client instead.
    jax._src.xla_bridge._clear_backends()

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def fresh_transform_registry():
    """Isolate the global transform registry between tests."""
    from flexlight_tpu.scene.transform import reset_global_registry

    reset_global_registry()
    yield
    reset_global_registry()
