"""Background-thread batch prefetching.

The analogue of the reference's custom thread-pool ``HydraDataLoader``
(``hydragnn/preprocess/load_data.py:94-204``): host-side collation (padding
+ Pallas plan building) overlaps with device compute by running the
batcher iterator in a worker thread with a bounded queue.  CPU-affinity
pinning (reference ``HYDRAGNN_AFFINITY``) is honored when the OS exposes
``sched_setaffinity``.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, Optional


class PrefetchLoader:
    """Wrap any epoch-iterable loader; prefetch up to ``depth`` batches.

    With ``workers > 1`` and a loader exposing ``batch_indices(epoch)`` /
    ``build(chunk)`` (PaddedBatcher does), batches are built CONCURRENTLY
    by a thread pool in submission order — the analogue of the reference's
    multi-worker ``HydraDataLoader`` pool (``load_data.py:94-204``; numpy
    collation releases the GIL in the hot copies)."""

    _SENTINEL = object()

    def __init__(
        self,
        loader,
        depth: int = 2,
        affinity: Optional[list] = None,
        workers: int = 1,
    ):
        self.loader = loader
        self.depth = depth
        self.workers = max(int(workers), 1)
        self.affinity = affinity
        self._epoch = 0
        if affinity is None:
            env = os.environ.get("HYDRAGNN_TPU_AFFINITY")
            if env:
                self.affinity = [int(x) for x in env.split(",")]

    def set_epoch(self, epoch: int):
        self._epoch = epoch
        if hasattr(self.loader, "set_epoch"):
            self.loader.set_epoch(epoch)

    def __len__(self):
        return len(self.loader)

    def _iter_pool(self) -> Iterator:
        from concurrent.futures import ThreadPoolExecutor

        chunks = self.loader.batch_indices(self._epoch)
        window = self.depth * self.workers
        with ThreadPoolExecutor(max_workers=self.workers) as ex:
            pending = []
            it = iter(chunks)
            for chunk in it:
                pending.append(ex.submit(self.loader.build, chunk))
                if len(pending) >= window:
                    yield pending.pop(0).result()
            for fut in pending:
                yield fut.result()

    def __iter__(self) -> Iterator:
        if self.workers > 1 and hasattr(self.loader, "batch_indices"):
            yield from self._iter_pool()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        err = []

        def worker():
            if self.affinity and hasattr(os, "sched_setaffinity"):
                try:
                    os.sched_setaffinity(0, self.affinity)
                except OSError:
                    pass
            try:
                for batch in self.loader:
                    q.put(batch)
            except Exception as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                q.put(self._SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is self._SENTINEL:
                break
            yield item
        t.join()
        if err:
            raise err[0]
