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
    """Wrap any epoch-iterable loader; prefetch up to ``depth`` batches."""

    _SENTINEL = object()

    def __init__(self, loader, depth: int = 2, affinity: Optional[list] = None):
        self.loader = loader
        self.depth = depth
        self.affinity = affinity
        if affinity is None:
            env = os.environ.get("HYDRAGNN_TPU_AFFINITY")
            if env:
                self.affinity = [int(x) for x in env.split(",")]

    def set_epoch(self, epoch: int):
        if hasattr(self.loader, "set_epoch"):
            self.loader.set_epoch(epoch)

    def __len__(self):
        return len(self.loader)

    def __iter__(self) -> Iterator:
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
