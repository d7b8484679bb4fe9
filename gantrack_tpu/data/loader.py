"""Infinite shuffled data loading for the single-controller TPU trainer.

Capability parity with the reference's ``misc.InfiniteSampler`` +
``torch.utils.data.DataLoader`` combination
(``torch_utils/misc.py:111-142``, ``training_loop_mi_multimodal.py:177-179``):
seeded windowed-shuffle infinite iteration with per-replica striding,
background prefetch, and the ``[0,255] → [-1,1]`` normalisation the
training loop applies (``training_loop:316``).

TPU-native notes: a single host feeds all local devices, so the loader
yields *global* batches; device placement/sharding happens via
``parallel.shard_batch``.  Multi-host setups stride by
``jax.process_index()`` exactly like reference ranks.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

from .dataset import GANDataset


def infinite_indices(
    n: int,
    rank: int = 0,
    num_replicas: int = 1,
    shuffle: bool = True,
    seed: int = 0,
    window_size: float = 0.5,
) -> Iterator[int]:
    """Reference ``InfiniteSampler.__iter__`` semantics, bit-for-bit:
    initial seeded shuffle then a sliding-window swap per visit."""
    assert n > 0
    order = np.arange(n)
    rnd = None
    window = 0
    if shuffle:
        rnd = np.random.RandomState(seed)
        rnd.shuffle(order)
        window = int(np.rint(order.size * window_size))
    idx = 0
    while True:
        i = idx % order.size
        if idx % num_replicas == rank:
            yield int(order[i])
        if window >= 2:
            j = (i - rnd.randint(window)) % order.size
            order[i], order[j] = order[j], order[i]
        idx += 1


class InfiniteLoader:
    """Yields ``(images [B,H,W,C] f32 in [-1,1], labels [B,label_dim])``
    batches forever, prefetched on background threads.

    ``num_workers > 1`` parallelises batch construction (the reference
    feeds each rank with a 3-worker torch DataLoader,
    ``training_loop_mi_multimodal.py:177-179``) while keeping the batch
    STREAM deterministic: workers claim sequence-numbered index lists
    from the shared sampler under a lock and a reorder buffer yields
    batches in sequence order, so the consumed stream is bit-identical
    to ``num_workers=1``.
    """

    def __init__(
        self,
        dataset: GANDataset,
        batch_size: int,
        rank: int = 0,
        num_replicas: int = 1,
        shuffle: bool = True,
        seed: int = 0,
        window_size: float = 0.5,
        normalize: bool = True,
        prefetch: int = 2,
        start: bool = True,
        num_workers: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.normalize = normalize
        self._indices = infinite_indices(
            len(dataset), rank=rank, num_replicas=num_replicas,
            shuffle=shuffle, seed=seed, window_size=window_size,
        )
        self._stop = threading.Event()
        self._threads: list = []
        self._seq_lock = threading.Lock()
        self._next_build = 0
        self._cond = threading.Condition()
        self._results: dict = {}
        self._next_yield = 0
        self._cap = max(prefetch, num_workers)
        self._num_workers = max(1, int(num_workers)) if start else 0
        for _ in range(self._num_workers):
            t = threading.Thread(target=self._worker, daemon=True)
            t.start()
            self._threads.append(t)

    def _build(self, idx) -> Tuple[np.ndarray, np.ndarray]:
        if hasattr(self.dataset, "gather_batch"):
            # Native C++ batched gather (sharded memmap datasets);
            # get_label reads the in-memory label table only.
            labels = np.stack([self.dataset.get_label(i) for i in idx]).astype(np.float32)
            images = self.dataset.gather_batch(np.asarray(idx), normalize=self.normalize)
            return images, labels
        items = [self.dataset[i] for i in idx]  # one raw read per item
        labels = np.stack([it[1] for it in items]).astype(np.float32)
        images = np.stack([it[0] for it in items]).astype(np.float32)
        if self.normalize:
            images = images / 127.5 - 1.0
        return images, labels

    def _make_batch(self) -> Tuple[np.ndarray, np.ndarray]:
        return self._build([next(self._indices) for _ in range(self.batch_size)])

    def _claim(self):
        with self._seq_lock:
            seq = self._next_build
            self._next_build += 1
            idx = [next(self._indices) for _ in range(self.batch_size)]
        return seq, idx

    def _worker(self):
        while not self._stop.is_set():
            seq, idx = self._claim()
            batch = self._build(idx)
            with self._cond:
                while (seq - self._next_yield >= self._cap
                       and not self._stop.is_set()):
                    self._cond.wait(0.5)
                if self._stop.is_set():
                    return
                self._results[seq] = batch
                self._cond.notify_all()

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[np.ndarray, np.ndarray]:
        if not self._threads:
            return self._make_batch()
        with self._cond:
            while self._next_yield not in self._results:
                self._cond.wait()
            batch = self._results.pop(self._next_yield)
            self._next_yield += 1
            self._cond.notify_all()
        return batch

    def close(self):
        self._stop.set()
        with self._cond:
            self._cond.notify_all()
