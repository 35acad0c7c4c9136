"""Debug-mode NaN/Inf guards (SURVEY §5).

The reference has no sanitizers; its benign races disappear here because
frames are pure functions. What replaces them is numeric guarding:

- `nan_guard()` — context manager enabling `jax_debug_nans`, which makes
  any NaN-producing primitive under jit raise at the exact operation.
- `assert_finite(tree, name)` — in-graph checks via `jax.debug` /
  `checkify`-free error: inserts a `lax.cond`-free host assertion using
  `jax.debug.callback`, active only when debug mode is on (zero overhead
  otherwise: the call is not traced in).
- `debug_enabled()` — env toggle `FLEXLIGHT_DEBUG=1`, read once.

The renderer classes call `assert_finite` on each frame's display output
and history state when debug mode is on.
"""

from __future__ import annotations

import contextlib
import os

_DEBUG = None


def debug_enabled() -> bool:
    global _DEBUG
    if _DEBUG is None:
        _DEBUG = os.environ.get("FLEXLIGHT_DEBUG", "0") not in ("", "0")
    return _DEBUG


def set_debug(enabled: bool) -> None:
    """Programmatic override of the FLEXLIGHT_DEBUG env toggle."""
    global _DEBUG
    _DEBUG = bool(enabled)


@contextlib.contextmanager
def nan_guard():
    """Enable jax_debug_nans within the block: NaN-producing primitives
    under jit raise FloatingPointError at the faulting op."""
    import jax

    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def _check_host(name, *leaves):
    import numpy as np

    for k, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"non-finite values in {name}[leaf {k}]: {bad} elements "
                f"(shape {arr.shape})")


def assert_finite(tree, name: str) -> None:
    """Host-side finiteness check on a pytree of arrays when debug mode is
    on; no-op (not traced) otherwise. Usable inside jit via debug.callback
    and outside on concrete arrays."""
    if not debug_enabled():
        return
    import jax

    leaves = [x for x in jax.tree.leaves(tree)
              if hasattr(x, "dtype") and x.dtype.kind == "f"]
    if not leaves:
        return
    jax.debug.callback(_check_host, name, *leaves)
