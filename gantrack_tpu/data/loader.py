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
    batches forever, prefetched on a background thread."""

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
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.normalize = normalize
        self._indices = infinite_indices(
            len(dataset), rank=rank, num_replicas=num_replicas,
            shuffle=shuffle, seed=seed, window_size=window_size,
        )
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        if start:
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()

    def _make_batch(self) -> Tuple[np.ndarray, np.ndarray]:
        idx = [next(self._indices) for _ in range(self.batch_size)]
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

    def _worker(self):
        while not self._stop.is_set():
            batch = self._make_batch()
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[np.ndarray, np.ndarray]:
        if self._thread is None:
            return self._make_batch()
        return self._queue.get()

    def close(self):
        self._stop.set()
