"""Host data loader: sharded, deterministic, prefetching.

Replaces the reference's torch DataLoader + DistributedSampler
(det3d/datasets/loader/build_loader.py:8-27): each host iterates its own
shard of a deterministically shuffled epoch permutation (seeded by epoch,
like sampler.set_epoch, trainer.py:131-132), batches are collated to static
shapes (data/collate.py), and worker threads overlap the numpy pipeline with
device compute.  Batches are dropped-last so every step sees the same static
shape (no recompiles).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

from pillarnext_tpu.data.collate import collate


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        max_points: int,
        shuffle: bool = True,
        seed: int = 0,
        num_shards: int = 1,
        shard_index: int = 0,
        num_workers: int = 0,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_points = max_points
        self.shuffle = shuffle
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        # pad so every shard sees the same number of samples (DistributedSampler
        # semantics), then stride-shard across hosts
        total = -(-n // self.num_shards) * self.num_shards
        if total > n:
            order = np.concatenate([order, order[: total - n]])
        return order[self.shard_index :: self.num_shards]

    def __len__(self) -> int:
        per_shard = -(-len(self.dataset) // self.num_shards)
        if self.drop_last:
            return per_shard // self.batch_size
        return -(-per_shard // self.batch_size)

    def _make_batches(self) -> Iterator[list[int]]:
        idx = self._epoch_indices()
        end = (len(idx) // self.batch_size) * self.batch_size if self.drop_last else len(idx)
        for start in range(0, end, self.batch_size):
            yield idx[start : start + self.batch_size].tolist()

    def _load_batch(self, indices: list[int], rng: np.random.Generator) -> dict:
        samples = [self.dataset[i] for i in indices]
        return collate(samples, self.max_points, rng)

    def __iter__(self) -> Iterator[dict]:
        rng = np.random.default_rng(self.seed * 7919 + self.epoch)
        batches = list(self._make_batches())
        if self.num_workers <= 0:
            for b in batches:
                yield self._load_batch(b, rng)
            return

        # thread pool with an ordered bounded queue (prefetch depth = workers*2)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.num_workers * 2)
        stop = threading.Event()

        def producer():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    out_q.put(self._load_batch(b, rng))
            finally:
                out_q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()


def build_dataloader(
    dataset, batch_size: int, max_points: int, shuffle: bool, num_workers: int = 0, seed: int = 0
) -> DataLoader:
    """Reference-shaped builder (build_loader.py:8-27); shards across JAX
    processes automatically."""
    import jax

    return DataLoader(
        dataset,
        batch_size=batch_size,
        max_points=max_points,
        shuffle=shuffle,
        seed=seed,
        num_shards=jax.process_count(),
        shard_index=jax.process_index(),
        num_workers=num_workers,
    )
