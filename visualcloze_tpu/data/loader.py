"""Threaded prefetching data loader.

Replaces the reference's torch DataLoader (train.py:516-525): pulls dataset
items on a worker thread pool and prefetches ahead of the accelerator —
host-side CPU work overlaps TPU steps. No torch dependency.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Sequence


class DataLoader:
    """Iterate `sampler` indices, fetch dataset[i] on `num_workers` threads,
    group into batches with `collate_fn`, keep `prefetch` batches ready."""

    def __init__(
        self,
        dataset,
        sampler: Sequence[int],
        batch_size: int,
        collate_fn: Callable,
        num_workers: int = 4,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.sampler = list(sampler)
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)

    def __len__(self) -> int:
        return len(self.sampler) // self.batch_size

    def __iter__(self) -> Iterator:
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    batches = [
                        self.sampler[i : i + self.batch_size]
                        for i in range(0, len(self.sampler) - self.batch_size + 1, self.batch_size)
                    ]
                    futures_iter = (
                        [pool.submit(self.dataset.__getitem__, i) for i in batch]
                        for batch in batches
                    )
                    for futs in futures_iter:
                        if stop.is_set():
                            return
                        out_q.put(self.collate_fn([f.result() for f in futs]))
            finally:
                out_q.put(_SENTINEL)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is _SENTINEL:
                    return
                yield item
        finally:
            stop.set()


_SENTINEL = object()
