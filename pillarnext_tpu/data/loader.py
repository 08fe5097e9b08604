"""Host data loader: sharded, deterministic, multiprocess prefetching.

Replaces the reference's torch DataLoader + DistributedSampler
(det3d/datasets/loader/build_loader.py:8-27, 16 worker processes per GPU in
configs/dataloader/default.yaml:4): each host iterates its own shard of a
deterministically shuffled epoch permutation (seeded by epoch, like
sampler.set_epoch, trainer.py:131-132); ``num_workers`` forked processes run
the full numpy pipeline (GT-paste, multi-sweep decode, augment, assign,
collate) in parallel and stream collated batches back over pickle pipes in
order, overlapping host preprocessing with device compute.  Batches are
dropped-last so every step sees the same static shape (no recompiles).

Determinism: every batch is loaded under an RNG state derived from
(seed, epoch, batch_index), so the sample stream is reproducible for a
fixed worker count (same property as the reference's seeded torch workers;
streams differ across worker counts because the GT-paste BatchSampler's
cursor state lives per worker).
"""

from __future__ import annotations

import multiprocessing as mp
import traceback
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

    def _load_batch(self, indices: list[int], batch_index: int) -> dict:
        """Load one batch under a (seed, epoch, batch_index)-derived RNG state
        — both the explicit collate rng and the pipeline's ambient np.random
        (augmentations / GT-paste draw from the global stream, mirroring the
        reference pipeline's use of np.random in seeded torch workers)."""
        ss = np.random.SeedSequence([self.seed, self.epoch, batch_index])
        np.random.seed(int(ss.generate_state(1)[0]))
        rng = np.random.default_rng(ss)
        samples = [self.dataset[i] for i in indices]
        return collate(samples, self.max_points, rng)

    def _worker_loop(self, batch_list, batch_ids, out_q):
        try:
            for bidx, idxs in zip(batch_ids, batch_list):
                out_q.put(("ok", self._load_batch(idxs, bidx)))
            out_q.put(("done", None))
        except BaseException:
            out_q.put(("error", traceback.format_exc()))

    def __iter__(self) -> Iterator[dict]:
        batches = list(self._make_batches())
        w = self.num_workers
        if w <= 0:
            for i, b in enumerate(batches):
                yield self._load_batch(b, i)
            return

        # fork workers (dataset inherited by fork — nothing pickled on the
        # way in); worker j handles batches j, j+w, ...; the parent drains
        # queue (i mod w) so batches arrive in order while every worker
        # prefetches up to its queue bound ahead
        ctx = mp.get_context("fork")
        queues = [ctx.Queue(maxsize=4) for _ in range(w)]
        procs = [
            ctx.Process(
                target=self._worker_loop,
                args=(batches[j::w], list(range(j, len(batches), w)), queues[j]),
                daemon=True,
            )
            for j in range(w)
        ]
        for p in procs:
            p.start()
        try:
            for i in range(len(batches)):
                tag, payload = queues[i % w].get()
                if tag == "error":
                    raise RuntimeError(f"dataloader worker failed:\n{payload}")
                yield payload
        finally:
            for p in procs:
                p.terminate()
            for p in procs:
                p.join(timeout=5)


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
