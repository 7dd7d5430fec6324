"""Batch loader: multi-worker patch sampling feeding the TPU.

Replaces torch DataLoader (torch_em ``get_data_loader``, used everywhere in
the reference, e.g. my_dual_inputs_livecell.py:163) with a thread-pool
prefetching loader that stacks samples into NHWC numpy batches. Threads (not
processes) because the heavy per-sample work — cv2 blur, numpy crops — drops
the GIL, and thread workers avoid the fork+pickle overhead of the reference's
``num_workers=16`` worker processes.

Determinism: sample ``i`` of epoch ``e`` always uses
``default_rng((seed, epoch, index))`` regardless of worker count.

Note: ``drop_last=True`` by default (the reference keeps partial batches) —
variable batch shapes would retrigger XLA compilation.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Iterator, Optional, Sequence

import numpy as np


class Loader:
    """Iterable over stacked batches: each item is a tuple of NHWC arrays."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        num_workers: int = 0,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return max(n // self.batch_size, 1 if n >= self.batch_size else 0) or (
                1 if n > 0 else 0
            )
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, self._epoch)).shuffle(idx)
        return idx

    def _fetch(self, epoch: int, index: int):
        rng = np.random.default_rng((self.seed, epoch, int(index)))
        return self.dataset.sample(int(index), rng)

    @staticmethod
    def _stack(samples: Sequence[tuple]) -> tuple:
        n_fields = len(samples[0])
        return tuple(
            np.stack([s[f] for s in samples], axis=0) for f in range(n_fields)
        )

    def __iter__(self) -> Iterator[tuple]:
        epoch = self._epoch
        self._epoch += 1
        indices = self._epoch_indices()
        n_full = len(indices) // self.batch_size
        if not self.drop_last and len(indices) % self.batch_size:
            n_batches = n_full + 1
        else:
            n_batches = max(n_full, 1 if len(indices) >= 1 and n_full == 0 else n_full)
        if n_batches == 0:
            return

        def batch_slice(b):
            return indices[b * self.batch_size : (b + 1) * self.batch_size]

        if self.num_workers <= 0:
            for b in range(n_batches):
                rows = batch_slice(b)
                if len(rows) == 0:
                    continue
                yield self._stack([self._fetch(epoch, i) for i in rows])
            return

        # keep enough batches in flight that every worker has a sample queued
        # (a fixed prefetch of 2 starves >4 workers at small batch sizes)
        depth = max(
            self.prefetch + 1,
            (2 * self.num_workers + self.batch_size - 1) // self.batch_size,
        )
        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = []
            next_b = 0

            def submit_batch(b):
                rows = batch_slice(b)
                return [pool.submit(self._fetch, epoch, i) for i in rows]

            while next_b < n_batches and len(pending) < depth:
                pending.append(submit_batch(next_b))
                next_b += 1
            while pending:
                futures = pending.pop(0)
                if next_b < n_batches:
                    pending.append(submit_batch(next_b))
                    next_b += 1
                samples = [f.result() for f in futures]
                if samples:
                    yield self._stack(samples)


def get_data_loader(dataset, batch_size: int, **kwargs) -> Loader:
    """torch_em ``segmentation.get_data_loader`` equivalent."""
    return Loader(dataset, batch_size, **kwargs)
