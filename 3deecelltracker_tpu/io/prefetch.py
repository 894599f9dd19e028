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

    One-shot: a fully-consumed prefetcher yields nothing on re-iteration.
    Consumers that stop early (error paths) should call :meth:`close` so
    the worker threads stop loading and release the in-flight volumes —
    without it a worker blocks forever on the bounded queue, pinning
    ``depth + workers`` loaded volumes for the life of the process.
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
        self._done = False
        self._stop = threading.Event()

    def _put(self, item) -> bool:
        """Bounded put that gives up once :meth:`close` was called."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _worker(self):
        if self._workers == 1:
            for t in self._ts:
                if self._stop.is_set():
                    return
                try:
                    item = (t, self._load(t), None)
                except Exception as e:  # propagate loader errors in order
                    self._put((t, None, e))
                    return
                if not self._put(item):
                    return
            self._put(None)
            return
        # parallel loads, ordered delivery: submit up to `workers` ahead;
        # the bounded output queue supplies the `depth` backpressure
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(self._workers) as ex:
            pending = []
            idx = 0
            while pending or idx < len(self._ts):
                if self._stop.is_set():
                    for _, f in pending:
                        f.cancel()
                    return
                while (idx < len(self._ts)
                       and len(pending) < self._workers + self._depth):
                    t = self._ts[idx]
                    pending.append((t, ex.submit(self._load, t)))
                    idx += 1
                t, fut = pending.pop(0)
                try:
                    item = (t, fut.result(), None)
                except Exception as e:
                    for _, f in pending:
                        f.cancel()
                    self._put((t, None, e))
                    return
                if not self._put(item):
                    for _, f in pending:
                        f.cancel()
                    return
            self._put(None)

    def close(self):
        """Stop the workers and release in-flight volumes (idempotent)."""
        self._stop.set()

        def drain():
            while True:
                try:
                    self._q.get_nowait()
                except queue.Empty:
                    break

        # drain so a worker blocked on the bounded queue can observe the
        # stop flag and exit
        drain()
        if self._started:
            self._thread.join(timeout=5.0)
        # a worker mid-put can slip one item into the just-drained queue
        # before it re-checks the stop flag; drain again AFTER the join so
        # nothing stays pinned for the life of this object
        drain()

    def __iter__(self) -> Iterator:
        if self._done or self._stop.is_set():
            return
        if not self._started:
            self._thread.start()
            self._started = True
        while True:
            item = self._q.get()
            if item is None:
                self._done = True
                return
            t, vol, err = item
            if err is not None:
                self._done = True
                raise err
            yield t, vol
