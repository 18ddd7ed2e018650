"""Mixed-dataset batch sampling.

Reference ``data_loader/sampler.py`` (MixedBatchSampler): one batch
sampler per sub-dataset (so every batch is homogeneous — critical when
datasets differ in resolution/frame count) with the source dataset drawn
per batch by a size-weighted multinomial. Torch-free reimplementation
yielding global index lists over the concatenated dataset.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np


class MixedBatchSampler:
    def __init__(self, dataset_sizes: Sequence[int], batch_size: int,
                 drop_last: bool = True, seed: int = 0):
        self.sizes = list(dataset_sizes)
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.seed = seed
        self.offsets = np.concatenate([[0], np.cumsum(self.sizes)])[:-1]
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[List[int]]:
        rng = np.random.default_rng(self.seed + self.epoch)
        per_ds_batches = []
        for size, off in zip(self.sizes, self.offsets):
            perm = rng.permutation(size) + off
            nb = size // self.batch_size if self.drop_last else \
                -(-size // self.batch_size)
            batches = [perm[i * self.batch_size:(i + 1) * self.batch_size]
                       for i in range(nb)]
            per_ds_batches.append([b for b in batches if len(b)])
        counts = np.array([len(b) for b in per_ds_batches], np.float64)
        while counts.sum() > 0:
            probs = counts / counts.sum()
            ds = rng.choice(len(self.sizes), p=probs)
            yield list(per_ds_batches[ds].pop())
            counts[ds] -= 1

    def __len__(self):
        if self.drop_last:
            return sum(s // self.batch_size for s in self.sizes)
        return sum(-(-s // self.batch_size) for s in self.sizes)
