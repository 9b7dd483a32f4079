"""Windowed sampling + batching over datasets.

Equivalent of the reference's MultiDataset / AnemoiDatasetsDataModule
(/root/reference/training/src/anemoi/training/data/multidataset.py:38,
datamodule.py:30): compute valid anchor indices (missing-data aware,
usable_indices.py:44), seeded per-epoch shuffling, window extraction, and
host->device batching.  Multi-host sharding (reader groups) maps onto
per-process anchor striding (set ``shard_index``/``num_shards``).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from anemoi_tpu.data.dataset import BaseDataset
from anemoi_tpu.utils.seeding import context_seed


def usable_window_starts(
    num_times: int, window: int, missing: set, drop_tail: int = 0
) -> np.ndarray:
    """Start indices t such that [t, t+window) contains no missing step
    (ref data/usable_indices.py:44-124)."""
    ok = np.ones(num_times, dtype=bool)
    for m in missing:
        if 0 <= m < num_times:
            ok[m] = False
    starts = []
    limit = num_times - window + 1 - drop_tail
    run = 0
    for t in range(num_times):
        run = run + 1 if ok[t] else 0
        start = t - window + 1
        if start >= 0 and start < limit and run >= window:
            starts.append(start)
    return np.asarray(starts, dtype=np.int64)


class WindowSampler:
    """Seeded, shardable sampler of window start indices."""

    def __init__(
        self,
        starts: np.ndarray,
        batch_size: int,
        shuffle: bool = True,
        seed_context: str = "data-shuffle",
        shard_index: int = 0,
        num_shards: int = 1,
        drop_last: bool = True,
    ) -> None:
        self.starts = starts
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed_context = seed_context
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.drop_last = drop_last

    def epoch_batches(self, epoch: int) -> Iterator[np.ndarray]:
        order = self.starts.copy()
        if self.shuffle:
            rng = np.random.default_rng(context_seed(f"{self.seed_context}-{epoch}"))
            rng.shuffle(order)
        # shard across processes (reader-group equivalent), then batch
        local = order[self.shard_index :: self.num_shards]
        n_full = len(local) // self.batch_size
        for i in range(n_full):
            yield local[i * self.batch_size : (i + 1) * self.batch_size]
        if not self.drop_last and len(local) % self.batch_size:
            yield local[n_full * self.batch_size :]

    def __len__(self) -> int:
        local = len(self.starts[self.shard_index :: self.num_shards])
        return local // self.batch_size


class DataModule:
    """Builds train/val batches over a dict of datasets.

    Batch layout per dataset: [B, window, E, G, V] float32 in data space
    (un-normalised); window = n_step_input + rollout * n_step_output.
    """

    def __init__(
        self,
        datasets: Dict[str, BaseDataset],
        n_step_input: int = 2,
        n_step_output: int = 1,
        rollout: int = 1,
        batch_size: int = 1,
        validation_fraction: float = 0.15,
        shard_index: int = 0,
        num_shards: int = 1,
    ) -> None:
        self.datasets = datasets
        self.n_step_input = n_step_input
        self.n_step_output = n_step_output
        self.rollout = rollout
        self.batch_size = batch_size
        self.window = n_step_input + rollout * n_step_output

        lengths = {len(ds) for ds in datasets.values()}
        assert len(lengths) == 1, "All datasets must share the time axis"
        num_times = lengths.pop()

        missing: set = set()
        for ds in datasets.values():
            missing |= ds.missing
        starts = usable_window_starts(num_times, self.window, missing)
        n_val = max(1, int(len(starts) * validation_fraction))
        self.train_starts = starts[:-n_val]
        self.val_starts = starts[-n_val:]

        self.train_sampler = WindowSampler(
            self.train_starts, batch_size, shuffle=True,
            shard_index=shard_index, num_shards=num_shards,
        )
        self.val_sampler = WindowSampler(
            self.val_starts, batch_size, shuffle=False,
            shard_index=shard_index, num_shards=num_shards,
        )

    def set_rollout(self, rollout: int) -> None:
        """Grow the sampling window when the rollout curriculum advances
        (ref datamodule.py:143 set_epoch)."""
        if rollout == self.rollout:
            return
        self.rollout = rollout
        self.window = self.n_step_input + rollout * self.n_step_output
        num_times = len(next(iter(self.datasets.values())))
        missing: set = set()
        for ds in self.datasets.values():
            missing |= ds.missing
        starts = usable_window_starts(num_times, self.window, missing)
        n_val = max(1, int(len(starts) * 0.15))
        self.train_sampler.starts = starts[:-n_val]
        self.val_sampler.starts = starts[-n_val:]

    def make_batch(self, start_indices: np.ndarray) -> Dict[str, np.ndarray]:
        batch = {}
        for name, ds in self.datasets.items():
            windows = [ds.get_window(int(s), self.window) for s in start_indices]
            batch[name] = np.stack(windows, axis=0)  # [B, T, E, G, V]
        return batch

    def train_batches(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        for idx in self.train_sampler.epoch_batches(epoch):
            yield self.make_batch(idx)

    def val_batches(self) -> Iterator[Dict[str, np.ndarray]]:
        for idx in self.val_sampler.epoch_batches(0):
            yield self.make_batch(idx)

    @property
    def statistics(self) -> Dict[str, Dict[str, np.ndarray]]:
        return {name: ds.statistics for name, ds in self.datasets.items()}

    @property
    def name_to_index(self) -> Dict[str, Dict[str, int]]:
        return {name: ds.name_to_index for name, ds in self.datasets.items()}
