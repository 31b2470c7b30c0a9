"""Persistent XLA compilation cache.

This environment compiles through a remote tunnel (~2 min for the paper-scale
model); caching compiled executables across processes makes every entry point
after the first fast. Safe no-op when unavailable.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "NYLON_XLA_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "nylon_amt_tpu",
                     "xla"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
