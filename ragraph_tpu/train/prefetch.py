"""Host-side input prefetching.

The trainer's batch production (shuffling + rejection negative sampling,
even with the C++ sampler) runs on host between device steps. This
iterator overlaps it: a background thread keeps a small queue of prepared
batches while the device executes, so host work hides behind device time.
Order and contents are identical to the wrapped iterator (determinism is
preserved — the producer is the same generator, just ahead of the
consumer).
"""

from __future__ import annotations

import queue
import threading

_SENTINEL = object()


class PrefetchIterator:
    """Wrap any iterator with an N-deep background-thread prefetch queue."""

    def __init__(self, iterable, depth: int = 2):
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None

        def worker():
            try:
                for item in iterable:
                    self._queue.put(item)
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                self._queue.put(_SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is _SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(iterable, depth: int = 2) -> PrefetchIterator:
    return PrefetchIterator(iterable, depth=depth)
