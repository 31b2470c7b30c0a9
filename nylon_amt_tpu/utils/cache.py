"""Persistent XLA compilation cache.

This environment compiles through a remote tunnel (~2 min for the paper-scale
model); caching compiled executables across processes makes every entry point
after the first fast. Safe no-op when unavailable.

The cache directory is keyed by a hardware fingerprint (CPU feature flags):
XLA:CPU AOT executables embed the compile machine's vector ISA, and the
cache key does NOT fully capture it — an entry compiled on one host can load
on another with "machine type doesn't match" errors and SIGILL-class
failures. Keying the path makes cross-host reuse structurally impossible.
"""

from __future__ import annotations

import hashlib
import os


def _hw_fingerprint() -> str:
    """Short hash of the host CPU's feature flags (stable per machine)."""
    try:
        with open("/proc/cpuinfo", encoding="utf-8") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(
        (platform.machine() + platform.processor()).encode()
    ).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "NYLON_XLA_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "nylon_amt_tpu",
                     "xla-" + _hw_fingerprint()))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
