"""RAM-cached dataset wrapper (reference: breaching/cases/data/cached_dataset.py:9-54).

Materializes the full dataset into contiguous numpy arrays once; afterwards
__getitem__ is a pure array slice — useful for repeated benchmark sweeps over
the same users, and the host-side analogue of the reference's pinned-memory
preload.
"""

from __future__ import annotations

import logging

import numpy as np

log = logging.getLogger(__name__)


class CachedDataset:
    def __init__(self, dataset, num_workers: int = 0):
        self.dataset = dataset
        self.name = getattr(dataset, "name", "dataset")
        self.mean = getattr(dataset, "mean", None)
        self.std = getattr(dataset, "std", None)
        self.classes = getattr(dataset, "classes", None)
        log.info(f"Caching {len(dataset)} examples of {self.name} into RAM...")
        first = dataset[0]
        self._cache = {
            key: np.empty((len(dataset), *np.asarray(val).shape), np.asarray(val).dtype)
            for key, val in first.items()
        }
        for idx in range(len(dataset)):
            sample = dataset[idx]
            for key, val in sample.items():
                self._cache[key][idx] = val
        log.info("Dataset cached.")

    def __len__(self):
        return len(next(iter(self._cache.values())))

    def __getitem__(self, idx):
        return {key: arr[idx] for key, arr in self._cache.items()}

    @property
    def labels(self):
        return self._cache.get("labels")
