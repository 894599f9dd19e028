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
    """Iterate ``load_fn(t)`` for each t with ``depth`` volumes in flight."""

    def __init__(self, load_fn: Callable[[int], object],
                 t_values: Iterable[int], depth: int = 2):
        self._load = load_fn
        self._ts = list(t_values)
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._started = False

    def _worker(self):
        for t in self._ts:
            try:
                self._q.put((t, self._load(t), None))
            except Exception as e:  # propagate loader errors in order
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
