"""Background data loading: thread-pool item fetch + batch prefetch.

The reference hides per-item mixing cost behind 10 dataloader worker
processes (SURVEY.md §3.1); here a thread pool runs the numpy/scipy item
synthesis (which releases the GIL inside fftconvolve/FFT) and a small
prefetch queue keeps batches ready while the TPU step runs.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List

import numpy as np


class ThreadedLoader:
    """Wrap a BatchLoader-style iterable: items are produced by worker
    threads, batches are prefetched into a bounded queue."""

    def __init__(self, dataset, batch_size: int, sampler, num_workers: int = 4,
                 prefetch: int = 2, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.drop_last = drop_last

    def __len__(self) -> int:
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    buf: List = []
                    for item in pool.map(self.dataset.__getitem__, iter(self.sampler)):
                        if stop.is_set():
                            return
                        buf.append(item)
                        if len(buf) == self.batch_size:
                            q.put(_collate(buf))
                            buf = []
                    if buf and not self.drop_last:
                        q.put(_collate(buf))
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def _collate(items):
    xs = np.stack([it[0] for it in items])
    ys = np.stack([it[1] for it in items]) if items[0][1] is not None else None
    paras = [it[2] for it in items]
    return xs, ys, paras
