"""Async host-side volume prefetch.

The tracking recurrence is serial over t (SURVEY §2.3); this prefetcher
loads and normalizes volume t+k on background threads while the device works
on volume t, so the TPU never stalls on TIFF decode (SURVEY §7 hard part e).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional


class VolumePrefetcher:
    """Iterate ``load_fn(t)`` for each t with ``depth`` volumes in flight.

    ``workers`` > 1 runs that many loads concurrently (ordered delivery,
    first in-order error propagates).  Loads that end in a device upload
    are latency-bound through a remote/tunneled TPU link (~100 ms RPC per
    transfer regardless of size), so two workers roughly double upload
    throughput even on a single host core — the threads overlap RPC waits,
    not CPU.
    """

    def __init__(self, load_fn: Callable[[int], object],
                 t_values: Iterable[int], depth: int = 2,
                 workers: int = 1):
        self._load = load_fn
        self._ts = list(t_values)
        self._depth = max(1, depth)
        self._workers = max(1, workers)
        self._q: "queue.Queue" = queue.Queue(maxsize=self._depth)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._started = False

    def _worker(self):
        if self._workers == 1:
            for t in self._ts:
                try:
                    self._q.put((t, self._load(t), None))
                except Exception as e:  # propagate loader errors in order
                    self._q.put((t, None, e))
                    return
            self._q.put(None)
            return
        # parallel loads, ordered delivery: submit up to `workers` ahead;
        # the bounded output queue supplies the `depth` backpressure
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(self._workers) as ex:
            pending = []
            idx = 0
            while pending or idx < len(self._ts):
                while (idx < len(self._ts)
                       and len(pending) < self._workers + self._depth):
                    t = self._ts[idx]
                    pending.append((t, ex.submit(self._load, t)))
                    idx += 1
                t, fut = pending.pop(0)
                try:
                    self._q.put((t, fut.result(), None))
                except Exception as e:
                    for _, f in pending:
                        f.cancel()
                    self._q.put((t, None, e))
                    return
            self._q.put(None)

    def __iter__(self) -> Iterator:
        if not self._started:
            self._thread.start()
            self._started = True
        while True:
            item = self._q.get()
            if item is None:
                return
            t, vol, err = item
            if err is not None:
                raise err
            yield t, vol
