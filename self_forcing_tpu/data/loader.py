"""Host-side data loading: per-process sharding + background prefetch.

Replaces torch DataLoader + DistributedSampler (trainer/distillation.py:
148-154, inference.py:96-99): each JAX process reads its own slice of the
dataset; a daemon thread prefetches and collates batches so the TPU never
waits on the host."""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np


class DistributedSampler:
    """Deterministic per-process index shard with optional shuffling —
    semantics of torch's DistributedSampler(drop_last=False)."""

    def __init__(self, dataset_len: int, num_replicas: int | None = None,
                 rank: int | None = None, shuffle: bool = True, seed: int = 0):
        if num_replicas is None or rank is None:
            import jax
            num_replicas = jax.process_count()
            rank = jax.process_index()
        self.dataset_len = dataset_len
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.num_samples = -(-dataset_len // num_replicas)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[int]:
        idx = np.arange(self.dataset_len)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        # pad to make evenly divisible (torch semantics: repeat the
        # index list as many times as needed — idx[:pad] alone under-pads
        # when pad > dataset_len, desyncing replica step counts)
        pad = self.num_samples * self.num_replicas - len(idx)
        if pad:
            reps = np.tile(idx, -(-pad // max(len(idx), 1)))
            idx = np.concatenate([idx, reps[:pad]])
        return iter(idx[self.rank::self.num_replicas].tolist())

    def __len__(self):
        return self.num_samples


def default_collate(samples: list[dict]) -> dict:
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], (str, dict)):
            out[k] = vals
        else:
            out[k] = np.stack([np.asarray(v) for v in vals])
    return out


class DataLoader:
    """Minimal prefetching loader: iterates sampler indices, collates
    batches on a daemon thread, hands them over a bounded queue."""

    def __init__(self, dataset, batch_size: int,
                 sampler: Optional[DistributedSampler] = None,
                 collate_fn: Callable = default_collate,
                 prefetch: int = 2, drop_last: bool = True,
                 infinite: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler or DistributedSampler(
            len(dataset), num_replicas=1, rank=0)
        self.collate_fn = collate_fn
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.infinite = infinite

    def __len__(self):
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            # any exception (corrupt shard, collate failure) must reach
            # the consumer — a dead worker that never enqueues a sentinel
            # leaves the training loop blocked on q.get() forever
            try:
                epoch = self.sampler.epoch
                while not stop.is_set():
                    batch = []
                    for i in self.sampler:
                        if stop.is_set():
                            return
                        batch.append(self.dataset[i])
                        if len(batch) == self.batch_size:
                            q.put(self.collate_fn(batch))
                            batch = []
                    if batch and not self.drop_last:
                        q.put(self.collate_fn(batch))
                    if not self.infinite:
                        break
                    epoch += 1
                    self.sampler.set_epoch(epoch)
                q.put(None)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
