"""Host-side pipeline overlap: a single-thread, bounded-queue prefetcher.

JAX dispatch is asynchronous, so the device can run ahead of the host —
but only if the host keeps feeding it. The loader's per-batch work
(augmentation DSP, window slicing) otherwise serializes with dispatch on
the main thread. Wrapping the loader in a one-deep-or-more background
prefetch overlaps batch N+1's host work with step N's device compute
(the reference gets the same overlap from DataLoader worker processes,
`cpc/dataset.py:528-534`).
"""

from __future__ import annotations

import queue
import threading


class PrefetchIterator:
    """Iterates `iterable` on a daemon thread, buffering up to `depth`
    items. Order-preserving; exceptions re-raise at the consuming site.

    `transform`, when given, runs on the worker thread per item BEFORE
    queueing — the hook that moves per-batch host work (and device
    staging: `jax.device_put` is thread-safe and asynchronous) off the
    dispatch thread, double-buffering batch N+1's upload behind step N's
    compute."""

    _DONE = object()

    def __init__(self, iterable, depth: int = 2, transform=None):
        self._queue: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._error = None
        self._transform = transform
        self._thread = threading.Thread(
            target=self._worker, args=(iterable,), daemon=True)
        self._thread.start()

    def _worker(self, iterable):
        try:
            for item in iterable:
                if self._transform is not None:
                    item = self._transform(item)
                self._queue.put(item)
        except BaseException as exc:  # re-raised on the consumer thread
            self._error = exc
        finally:
            self._queue.put(self._DONE)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._DONE:
            self._thread.join()
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


def prefetch(iterable, depth: int = 2, transform=None):
    """Background-prefetch `iterable` (depth <= 0 disables)."""
    if depth <= 0:
        it = iter(iterable)
        if transform is None:
            return it
        return map(transform, it)
    return PrefetchIterator(iterable, depth, transform=transform)
