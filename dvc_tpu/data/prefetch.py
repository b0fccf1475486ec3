"""Background-thread batch prefetching (the torch DataLoader-workers
equivalent; reference ``train.py:71-75`` nthreads).

Wraps any (batch, meta) iterator: host-side collation runs in a worker
thread while the device computes, so input latency overlaps the step.
``DevicePrefetchLoader`` adds the second stage torch has no analogue for:
a device-transfer lookahead that double-buffers batches in HBM.
"""

from __future__ import annotations

import collections
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
        stop = threading.Event()
        err = []

        def put(item) -> bool:
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
                    if not put(item):
                        return      # consumer went away (break / exception)
            except Exception as e:  # propagate into the consumer
                err.append(e)
            finally:
                put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            # unblock and reap the worker even when the consumer abandons
            # the generator early (debug-mode breaks, eval exceptions) —
            # otherwise the thread parks forever in q.put holding a batch
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join()
        if err:
            raise err[0]


class DevicePrefetchLoader:
    """Two-stage input pipeline: host collation in a worker thread
    (``PrefetchLoader``) plus a device-transfer lookahead.

    ``prepare`` (normally ``Trainer.prepare_batch``) runs bucketing and
    issues the ``jax.device_put`` for the *next* batch while the current
    step computes — device_put is asynchronous, so the host->device link
    (PCIe, or a long remote-TPU tunnel) overlaps the MXU instead of
    serializing with it.  Yielded batches carry ``_prepared=True`` so the
    trainer passes them straight to the jitted step.
    """

    def __init__(self, loader, prepare, depth: int = 1, host_depth: int = 2):
        self.loader = loader
        self.prepare = prepare
        self.depth = max(depth, 1)
        self.host_depth = host_depth

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        pending = collections.deque()
        for batch, meta in PrefetchLoader(self.loader, self.host_depth):
            pending.append((self.prepare(batch), meta))
            if len(pending) > self.depth:
                yield pending.popleft()
        while pending:
            yield pending.popleft()
