"""Prefetching, shardable data loader — the TPU-native replacement for the
reference's torch DataLoader + DistributedSampler (reference datasets.py:569-577,
train_ddp.py semantics: per-process dataset shard, per-worker seeding, drop_last).

Two prefetch backends:
  * ``MultiprocessLoader`` (default for training): forked worker *processes*,
    the analog of the reference's num_workers=4 torch DataLoader
    (datasets.py:576-577) — PIL/ImageEnhance and the numpy augmentation chain
    hold the GIL, so threads cannot scale decode on many-core hosts.
  * ``ShardedLoader``: thread-pool prefetch (zero-copy, no fork) for
    evaluation pipelines and platforms where fork is unavailable.

For multi-host, pass process_index/process_count to shard batches the way
DistributedSampler does.
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import random as _random
import threading
from typing import Dict, Iterator

import numpy as np


def _collate(items):
    out = {}
    for k in items[0]:
        if k == "extra_info":
            out[k] = [it[k] for it in items]
        else:
            out[k] = np.stack([it[k] for it in items])
    return out


class ShardedLoader:
    """Epoch-shuffled, sharded, prefetching batch iterator.

    Parity notes: global shuffle with a per-epoch seed (DistributedSampler
    (shuffle=True) semantics), per-process contiguous strided shard,
    drop_last=True, worker threads seeded per (epoch, worker).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 2, drop_last: bool = True,
                 process_index: int = 0, process_count: int = 1,
                 seed: int = 1234, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.process_count
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            idx = rng.permutation(n)
        else:
            idx = np.arange(n)
        # DistributedSampler-style strided shard.
        return idx[self.process_index::self.process_count]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._epoch_indices()
        nb = len(indices) // self.batch_size if self.drop_last else \
            (len(indices) + self.batch_size - 1) // self.batch_size
        batches = [indices[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]

        work_q: "queue.Queue" = queue.Queue()
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        for bi, b in enumerate(batches):
            work_q.put((bi, b))
        results = {}
        next_emit = [0]
        lock = threading.Lock()
        stop = threading.Event()

        def worker(wid):
            # Per-worker seeding (reference datasets.py:69-75 analog).
            np.random.seed((self.seed + self.epoch * 1000 + wid) % (2 ** 31))
            _random.seed(self.seed + self.epoch * 1000 + wid)
            while not stop.is_set():
                try:
                    bi, b = work_q.get_nowait()
                except queue.Empty:
                    return
                batch = _collate([self.dataset[int(i)] for i in b])
                # Emit in order.
                while not stop.is_set():
                    with lock:
                        if next_emit[0] == bi:
                            out_q.put(batch)
                            next_emit[0] += 1
                            break
                    stop.wait(0.005)

        threads = [threading.Thread(target=worker, args=(w,), daemon=True)
                   for w in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            for _ in range(nb):
                yield out_q.get()
        finally:
            stop.set()
        self.epoch += 1


def _mp_worker(dataset, batches, seed, result_q, ack_q, cap):
    """Worker-process loop: load + collate an assigned list of batches.

    Runs in a forked child; touches only numpy/PIL (never jax — the parent's
    TPU client must not be exercised post-fork).  At most ``cap`` produced
    batches may be un-emitted at once (the consumer acks each emission via
    ``ack_q``) — torch DataLoader's per-worker outstanding-task cap — so a
    slow worker gating in-order emission cannot cause fast workers to pile
    their whole epoch share into host memory."""
    try:
        np.random.seed(seed % (2 ** 31))
        _random.seed(seed)
        outstanding = 0
        for bi, b in batches:
            while outstanding >= cap:
                ack_q.get()
                outstanding -= 1
            result_q.put((bi, _collate([dataset[int(i)] for i in b])))
            outstanding += 1
    except KeyboardInterrupt:
        pass
    finally:
        result_q.put((-1, None))  # worker-done sentinel


class MultiprocessLoader:
    """Epoch-shuffled, sharded batch iterator fed by worker processes.

    Same sampling semantics as ShardedLoader (global per-epoch shuffle,
    strided process shard, drop_last, per-(epoch, worker) seeding); batches
    are assigned to workers round-robin (torch DataLoader order) and emitted
    strictly in order.  Reference: core/datasets.py:569-577 (num_workers=4
    per-GPU loader processes).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, drop_last: bool = True,
                 process_index: int = 0, process_count: int = 1,
                 seed: int = 1234, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0
        self._ctx = mp.get_context("fork")

    __len__ = ShardedLoader.__len__
    _epoch_indices = ShardedLoader._epoch_indices

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._epoch_indices()
        nb = len(indices) // self.batch_size if self.drop_last else \
            (len(indices) + self.batch_size - 1) // self.batch_size
        batches = [(bi, indices[bi * self.batch_size:
                                (bi + 1) * self.batch_size])
                   for bi in range(nb)]
        nw = min(self.num_workers, max(1, nb))
        result_q = self._ctx.Queue(maxsize=self.prefetch + nw)
        # Per-worker ack queues implement the outstanding-batch cap: worker
        # wid owns batches wid::nw, so buffered memory is bounded by
        # nw * prefetch batches even when one worker is slow.
        ack_qs = [self._ctx.Queue() for _ in range(nw)]
        procs = []
        for wid in range(nw):
            p = self._ctx.Process(
                target=_mp_worker,
                args=(self.dataset, batches[wid::nw],
                      self.seed + self.epoch * 1000 + wid, result_q,
                      ack_qs[wid], max(1, self.prefetch)),
                daemon=True)
            p.start()
            procs.append(p)
        try:
            buffered, next_emit, done = {}, 0, 0
            while next_emit < nb:
                while next_emit not in buffered:
                    bi, batch = result_q.get()
                    if bi < 0:
                        done += 1
                        if done == nw:  # all workers done, batch still missing
                            raise RuntimeError(
                                "loader workers exited before producing all "
                                f"batches ({next_emit}/{nb})")
                        continue
                    buffered[bi] = batch
                yield buffered.pop(next_emit)
                ack_qs[next_emit % nw].put(None)
                next_emit += 1
        finally:
            for p in procs:
                if p.is_alive():
                    p.terminate()
            for p in procs:
                p.join(timeout=5)
            result_q.close()
            for q in ack_qs:
                q.close()
        self.epoch += 1


class InfiniteLoader:
    """Wraps a loader to iterate forever (training-step driven)."""

    def __init__(self, loader):
        self.loader = loader

    def __iter__(self):
        while True:
            yield from self.loader
