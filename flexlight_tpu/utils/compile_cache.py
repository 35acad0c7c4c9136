"""Persistent XLA/Mosaic compilation cache.

The denoise filter kernels unroll hundreds of static offsets and take
minutes of Mosaic compile per pass shape; the cache makes that one-time
per machine (measured: second_filter cold 100 s -> warm 24 s process
total). Opt out with FLEXLIGHT_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.environ.get(
    "FLEXLIGHT_COMPILE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "flexlight_jax"))


def enable_compile_cache(path: str = DEFAULT_DIR) -> None:
    if os.environ.get("FLEXLIGHT_NO_COMPILE_CACHE", "0") not in ("", "0"):
        return
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
