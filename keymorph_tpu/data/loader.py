"""Background prefetching for host-side data loading.

The reference hides IO latency behind torch DataLoader worker processes
(SURVEY §3.1 "PROCESS BOUNDARY"). This host has one core, so processes would
thrash; instead a daemon thread pipelines the NIfTI decode (zlib inflate in
libkmio and numpy resize release the GIL) with device compute, keeping the
TPU fed between steps.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


class ThreadPrefetcher:
    """Wrap any (re-)iterable loader with an N-deep background prefetch queue.

    Each ``iter()`` spawns a fresh daemon thread that walks the underlying
    loader and fills a bounded queue; the consumer overlaps device compute
    with the next batch's IO. Exceptions in the worker propagate to the
    consumer at the point of ``next()``.
    """

    _SENTINEL = object()

    def __init__(self, loader: Iterable, depth: int = 2):
        assert depth >= 1
        self.loader = loader
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    def __iter__(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        stop = threading.Event()

        def _put(item) -> bool:
            """Bounded put that gives up when the consumer is gone."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in self.loader:
                    if not _put(item):
                        return  # consumer stopped early (break/close)
            except BaseException as e:  # propagate into the consumer
                _put(("__prefetch_error__", e))
            finally:
                _put(self._SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()

        try:
            while True:
                item = q.get()
                if item is self._SENTINEL:
                    return
                if (
                    isinstance(item, tuple)
                    and len(item) == 2
                    and item[0] == "__prefetch_error__"
                ):
                    raise item[1]
                yield item
        finally:
            # consumer broke out (or the generator was closed): release the
            # worker so it stops decoding and drops its queued items instead
            # of blocking on q.put forever (volumes are hundreds of MB)
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass


def device_prefetch(loader: Iterable, to_device=None, depth: int = 2):
    """ThreadPrefetcher + optional host->device transfer inside the worker.

    `to_device` maps a host batch to device arrays (e.g. a jax.device_put
    tree map or parallel.shard_batch); running it in the prefetch thread
    overlaps the PCIe/tunnel copy with compute too.
    """
    if to_device is None:
        return ThreadPrefetcher(loader, depth)

    class _Mapped:
        def __init__(self, inner):
            self.inner = inner

        def __len__(self):
            return len(self.inner)

        def __iter__(self):
            for item in self.inner:
                yield to_device(item)

    return ThreadPrefetcher(_Mapped(loader), depth)
