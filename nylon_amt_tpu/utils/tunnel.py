"""Host-memory hygiene for tunneled/proxied PJRT backends.

This environment reaches its TPU through an experimental tunnel client
(``axon``) that keeps a **journal of every host->device transfer** so it
can replay the session when the connection drops. The journal retains each
transferred payload (~one training batch, ~3 MB/step measured by
``scripts/probe_leak.py``), so any long run — full-MAESTRO training,
an endless serving session — grows host RSS without bound and is
eventually OOM-killed (observed: 118 GB RSS after ~27k steps).

The client exports ``axon_reset()``, which clears the journal (compiled
executables are retained — the first step after a reset re-runs in
milliseconds, no recompile) but **invalidates every device buffer
allocated before the reset**. The safe pattern is therefore a
*checkpoint fence*:

    evacuate live state to host  ->  axon_reset()  ->  restore to device

:func:`reset_transfer_journal` packages that pattern for arbitrary
pytrees, preserving per-leaf shardings and typed PRNG keys. It is a
**no-op returning the tree unchanged** when the process is not talking to
a journaling tunnel (real libtpu, CPU meshes, multi-host gloo), so
callers can invoke it unconditionally at natural boundaries:

* ``Trainer._fit_loop`` — after each (epoch, div) checkpoint, when
  ``TrainConfig.journal_reset_divs`` is set (default: every div on a
  tunnel backend; never elsewhere).
* ``infer.serve.StreamServer`` — every ``journal_reset_pumps`` pumps.

Nothing here is TPU-semantics-specific: on a locally attached chip the
probe shows flat RSS and this module never activates.
"""

from __future__ import annotations

import ctypes
import logging
from typing import Any

import jax
import numpy as np

log = logging.getLogger(__name__)

_RESET_FN: Any = None
_PROBED = False


def _find_reset() -> Any:
    """Locate ``axon_reset`` in an already-loaded tunnel cdylib.

    Scans the process map for a loaded shared object whose name contains
    ``axon`` and resolves the symbol from it. Never dlopens anything new:
    if the tunnel isn't already driving this process, there is no journal
    to clear.
    """
    global _RESET_FN, _PROBED
    if _PROBED:
        return _RESET_FN
    _PROBED = True
    try:
        seen: set[str] = set()
        with open("/proc/self/maps", "r", encoding="utf-8") as f:
            for line in f:
                path = line.rsplit(" ", 1)[-1].strip()
                if "axon" in path and path.endswith(".so") \
                        and path not in seen:
                    seen.add(path)
                    try:
                        lib = ctypes.CDLL(path)
                        fn = lib.axon_reset
                    except (OSError, AttributeError):
                        continue
                    fn.restype = ctypes.c_char_p
                    _RESET_FN = fn
                    return fn
    except OSError:
        pass
    return None


def journal_reset_supported() -> bool:
    """True when this process runs through a transfer-journaling tunnel
    whose journal we know how to clear."""
    return _find_reset() is not None


def _is_prng_key(x: Any) -> bool:
    return isinstance(x, jax.Array) and jax.dtypes.issubdtype(
        x.dtype, jax.dtypes.prng_key)


def reset_transfer_journal(tree: Any, *, force: bool = False) -> Any:
    """Clear the tunnel's transfer journal, carrying ``tree`` across.

    Every ``jax.Array`` leaf is fetched to host, the journal is reset
    (killing all device buffers), and the leaves are re-placed with their
    original shardings. Typed PRNG keys round-trip via
    ``jax.random.key_data``. Non-array leaves pass through untouched.

    Returns ``tree`` (possibly with fresh device arrays). When no
    journaling tunnel is present this is the identity, unless ``force``
    (used by tests with a monkeypatched reset).

    The caller must ensure ``tree`` covers **all** device state it still
    needs — any other pre-reset ``jax.Array`` is dead afterwards.
    """
    fn = _find_reset()
    if fn is None and not force:
        return tree

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    specs = []   # (kind, sharding, key_impl) per leaf
    fetch = []   # device arrays to evacuate, batched into ONE fetch
    for leaf in leaves:
        if _is_prng_key(leaf):
            specs.append(("key", leaf.sharding, jax.random.key_impl(leaf)))
            fetch.append(jax.random.key_data(leaf))
        elif isinstance(leaf, jax.Array):
            specs.append(("array", leaf.sharding, None))
            fetch.append(leaf)
        else:
            specs.append((None, None, None))
    # One batched fetch (per-leaf fetches cost one tunnel RTT each).
    fetched = iter(jax.device_get(fetch))
    host_leaves = [leaf if spec[0] is None else next(fetched)
                   for spec, leaf in zip(specs, leaves)]

    if fn is not None:
        err = fn()
        if err:
            log.warning("journal reset reported: %s", err)

    out = []
    for (kind, sharding, impl), h in zip(specs, host_leaves):
        if kind == "key":
            k = jax.random.wrap_key_data(jax.device_put(h), impl=impl)
            out.append(jax.device_put(k, sharding))
        elif kind == "array":
            out.append(jax.device_put(h, sharding))
        else:
            out.append(h)
    return jax.tree_util.tree_unflatten(treedef, out)
