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
    (ref data/usable_indices.py:91-124)."""
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


def intersect_anchor_rows(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(sequence, position) rows present in both anchor arrays, sorted
    (ref data/usable_indices.py:21-41)."""
    if a.size == 0 or b.size == 0:
        return np.empty((0, 2), dtype=np.int64)
    a = np.ascontiguousarray(a, dtype=np.int64)
    b = np.ascontiguousarray(b, dtype=np.int64)
    dtype = np.dtype((np.void, a.dtype.itemsize * a.shape[1]))
    common = np.intersect1d(a.view(dtype), b.view(dtype))
    return common.view(np.int64).reshape(-1, 2)


def compute_valid_anchors(
    datasets: Dict[str, BaseDataset], window: int
) -> np.ndarray:
    """Valid (sequence, position) anchors shared by ALL datasets: an anchor
    is valid if each dataset can sample the full window [p, p+window) inside
    sequence s (missing-aware).  The intersection across datasets is the
    MultiDataset anchor set (ref data/usable_indices.py:44-88)."""
    rel = np.arange(window, dtype=np.int64)
    inter: np.ndarray = None
    for name, ds in datasets.items():
        anchors = ds.compute_anchors(rel)
        if len(anchors) == 0:
            raise ValueError(f"No valid anchors for dataset '{name}'")
        inter = anchors if inter is None else intersect_anchor_rows(inter, anchors)
    if inter is None or len(inter) == 0:
        raise ValueError("No valid anchors after intersection across datasets")
    return inter


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

        anchors = compute_valid_anchors(datasets, self.window)
        n_val = max(1, int(len(anchors) * validation_fraction))
        self.train_starts = anchors[:-n_val]
        self.val_starts = anchors[-n_val:]

        self.train_sampler = WindowSampler(
            self.train_starts, batch_size, shuffle=True,
            shard_index=shard_index, num_shards=num_shards,
        )
        self.val_sampler = WindowSampler(
            self.val_starts, batch_size, shuffle=False,
            shard_index=shard_index, num_shards=num_shards,
        )
        # multi-host loading plan: {dataset: (batch_rows, grid_rows)} set by
        # the trainer (reader-group equivalent, ref multidataset.py:344-366).
        # Every process iterates the same global anchor order; make_batch
        # reads only this process's block.
        self.local_plan: Optional[Dict[str, Tuple[slice, slice]]] = None

    def set_rollout(self, rollout: int) -> None:
        """Grow the sampling window when the rollout curriculum advances
        (ref datamodule.py:143 set_epoch)."""
        if rollout == self.rollout:
            return
        self.rollout = rollout
        self.window = self.n_step_input + rollout * self.n_step_output
        anchors = compute_valid_anchors(self.datasets, self.window)
        n_val = max(1, int(len(anchors) * 0.15))
        self.train_sampler.starts = anchors[:-n_val]
        self.val_sampler.starts = anchors[-n_val:]

    def make_batch(self, anchors: np.ndarray) -> Dict[str, np.ndarray]:
        """``anchors``: [B, 2] (sequence, position) rows (or legacy [B] starts
        interpreted as sequence 0)."""
        anchors = np.asarray(anchors)
        if anchors.ndim == 1:
            anchors = np.stack([np.zeros_like(anchors), anchors], axis=1)
        batch = {}
        for name, ds in self.datasets.items():
            rows, grid_slice = anchors, slice(None)
            if self.local_plan is not None and name in self.local_plan:
                batch_rows, grid_slice = self.local_plan[name]
                rows = anchors[batch_rows]
            windows = [
                ds.get_seq_window(int(s), int(p), self.window, grid_slice)
                for s, p in rows
            ]
            batch[name] = np.stack(windows, axis=0)  # [B(_local), T, E, G(_local), V]
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
