"""Host->device input prefetching.

The reference feeds the GPU with a synchronous ``.to(device)`` copy inside
the step loop (``training/train.py:72-76``), so the device idles during
every host gather + transfer. Here the host side of the pipeline — the
memmap fancy-index gather in :meth:`WindowDataset.batches` plus the
``device_put`` enqueue — runs on a background thread, ``depth`` batches
ahead of the consumer. ``jax.device_put`` is async (it returns as soon as
the transfer is enqueued), so by the time the training loop asks for batch
``i+1`` its H2D copy has already overlapped batch ``i``'s compute.

Depth 2 is enough: one batch in flight on the device, one being gathered on
the host. Deeper queues only add host memory pressure.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


class _WorkerError:
    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetch(
    iterable: Iterable[T],
    transfer: Callable[[T], T] | None = None,
    depth: int = 2,
) -> Iterator[T]:
    """Iterate ``iterable`` through a background thread.

    ``transfer`` (e.g. ``device_put`` / mesh sharding) runs on the worker
    thread so the enqueued H2D copy overlaps the consumer's device compute.
    Worker exceptions re-raise at the consuming site; breaking out of the
    returned generator (``close()``/GC) stops the worker promptly.
    """
    if depth < 1:
        raise ValueError("prefetch depth must be >= 1")
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _put(item) -> bool:
        """Blocking put that aborts when the consumer went away."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterable:
                if stop.is_set():
                    return
                if transfer is not None:
                    item = transfer(item)
                if not _put(item):
                    return
            _put(_SENTINEL)
        except BaseException as exc:  # noqa: BLE001 — propagate to consumer
            _put(_WorkerError(exc))

    thread = threading.Thread(target=worker, name="input-prefetch",
                              daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, _WorkerError):
                raise item.exc
            yield item
    finally:
        stop.set()
        # Unblock a worker stuck on a full queue, then reap it.
        while thread.is_alive():
            try:
                q.get_nowait()
            except queue.Empty:
                pass
            thread.join(timeout=0.05)
