"""Background-thread batch prefetching (the torch DataLoader-workers
equivalent; reference ``train.py:71-75`` nthreads).

Wraps any (batch, meta) iterator: host-side collation runs in a worker
thread while the device computes, so input latency overlaps the step.
"""

from __future__ import annotations

import queue
import threading


class PrefetchLoader:
    def __init__(self, loader, depth: int = 2):
        self.loader = loader
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        sentinel = object()
        err = []

        def worker():
            try:
                for item in self.loader:
                    q.put(item)
            except Exception as e:  # propagate into the consumer
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
        if err:
            raise err[0]
