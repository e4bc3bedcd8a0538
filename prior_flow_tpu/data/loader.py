"""Host-side batching / prefetching data loader.

TPU-native replacement for the reference's ``torch.utils.data.DataLoader``
(4 worker processes, datasets.py:466-467): a thread-pool loader (image
decode in cv2/PIL releases the GIL) with double-buffered batch prefetch, an
infinite epoch-less iterator matching the reference's ``while`` train loop
(train_flow.py:119), and optional device-put with a target sharding so the
host->HBM copy overlaps compute.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np


def _stack_batch(samples):
    """Stack per-sample tuples into batch arrays (images stay NHWC)."""
    cols = list(zip(*samples))
    out = []
    for col in cols:
        if isinstance(col[0], np.ndarray):
            out.append(np.stack(col, axis=0))
        else:
            out.append(list(col))
    return tuple(out)


class DataLoader:
    """Shuffling, prefetching batch loader over an indexable dataset."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, drop_last: bool = True,
                 seed: int = 1234, prefetch: int = 2,
                 shard_index: int = 0, num_shards: int = 1):
        """``shard_index``/``num_shards``: multi-host data loading — each
        host reads its deterministic 1/num_shards slice of every (commonly
        seeded) shuffled epoch, so the global batch across hosts is a
        partition (the DCN side of SURVEY.md §2.3; single-host ICI sharding
        happens later via parallel.shard_batch)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.shard_index = shard_index
        self.num_shards = max(1, num_shards)
        self.seed = seed
        self._epochs_started = 0

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self, epoch: int):
        """Shuffled index order for one epoch, keyed by (seed, epoch) only —
        so any stream, started at any time (including a resumed run), sees
        the identical batch sequence for a given epoch number."""
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, int(epoch)]))
            rng.shuffle(idx)
        if self.num_shards > 1:
            per = len(idx) // self.num_shards
            idx = idx[self.shard_index * per:(self.shard_index + 1) * per]
        return idx

    def _stream(self, epochs: int = 1, start_batch: int = 0) -> Iterator:
        """Producer-thread stream over ``epochs`` epochs (-1 = forever).

        ONE producer thread and ONE worker pool serve the whole stream —
        per-epoch thread/pool churn (the previous design) both costs
        startup latency on 1-batch epochs and multiplies exposure to
        thread-start stalls under heavy host load.

        ``start_batch``: resume into the deterministic global batch
        sequence at this offset (epoch = start_batch // len(self), batch
        within it = start_batch % len(self)) — with per-epoch keyed
        shuffles and per-(epoch, index) augmentation rngs, a resumed run
        replays exactly the batches an uninterrupted run would have seen.
        """
        if len(self) == 0:
            # an empty loader would otherwise spin epochs forever in the
            # producer (yielding nothing while the consumer blocks) — fail
            # loudly instead
            raise ValueError(
                f"DataLoader has 0 batches: dataset of {len(self.dataset)} "
                f"samples, batch_size={self.batch_size}, "
                f"drop_last={self.drop_last}")

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                e = start_batch // len(self)
                first = start_batch % len(self)
                end = None if epochs < 0 else start_batch // len(self) + epochs
                while end is None or e < end:
                    if hasattr(self.dataset, "set_epoch"):
                        self.dataset.set_epoch(e)
                    idx = self._epoch_indices(e)
                    for i in range(first, len(self)):
                        if stop.is_set():
                            return
                        batch_idx = idx[i * self.batch_size:
                                        (i + 1) * self.batch_size]
                        samples = list(pool.map(self.dataset.__getitem__,
                                                batch_idx))
                        q.put(_stack_batch(samples))
                    first = 0
                    e += 1
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()

    def __iter__(self) -> Iterator:
        """One epoch per call. Successive calls advance the epoch number
        (fresh shuffle + fresh per-sample augmentation draws, like a torch
        DataLoader), while staying fully deterministic: the k-th ``iter()``
        of a loader always replays epoch k of the (seed-keyed) global batch
        sequence. One active stream per loader instance at a time."""
        epoch = self._epochs_started
        self._epochs_started += 1
        return self._stream(epochs=1, start_batch=epoch * len(self))

    def infinite(self, start_batch: int = 0) -> Iterator:
        """Epoch-less stream (reference train loop semantics,
        train_flow.py:119-199). ``start_batch`` resumes the deterministic
        batch sequence at a global step offset."""
        return self._stream(epochs=-1, start_batch=start_batch)


def device_prefetch(iterator, sharding=None, size: int = 2):
    """Move host batches onto device(s) ahead of compute.

    ``sharding``: optional ``jax.sharding.Sharding`` (e.g. batch-sharded
    NamedSharding) applied via ``jax.device_put`` — the multi-chip data
    path; with None, arrays go to the default device.
    """
    import jax

    buf = []
    it = iter(iterator)

    def put(batch):
        return tuple(
            jax.device_put(x, sharding) if isinstance(x, np.ndarray) else x
            for x in batch)

    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        yield buf.pop(0)
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
