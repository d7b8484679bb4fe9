"""Native C++ batch assembler: correctness vs NumPy path; loader wiring."""

import numpy as np
import pytest

from gantrack_tpu.data.dataset import ShardedArrayDataset
from gantrack_tpu.data.loader import InfiniteLoader
from gantrack_tpu.data.native import assemble_batch, native_available
from gantrack_tpu.data.preprocess.packaging import pack_shards


def test_assemble_batch_matches_numpy():
    shards = [
        (np.random.default_rng(i).random((5, 8, 8, 2)) * 255).astype(np.float32)
        for i in range(3)
    ]
    idx = np.array([0, 4, 5, 9, 10, 14], np.int64)
    flips = np.array([0, 1, 0, 1, 0, 1], np.uint8)
    got = assemble_batch(shards, idx, flips)
    all_data = np.concatenate(shards)
    for i, g in enumerate(idx):
        ref = all_data[g]
        if flips[i]:
            ref = ref[:, ::-1, :]
        np.testing.assert_allclose(got[i], ref / 127.5 - 1, rtol=1e-4, atol=1e-6)


def test_gather_batch_with_xflip(tmp_path):
    rng = np.random.default_rng(0)
    images = [(rng.random((8, 8, 1)) * 255).astype(np.float32) for _ in range(6)]
    pack_shards(str(tmp_path), "train", images, [f"i{n}" for n in range(6)], shard_size=4)
    ds = ShardedArrayDataset(str(tmp_path), split="train", xflip=True)
    n = len(ds)
    idx = np.arange(n)
    batch = ds.gather_batch(idx, normalize=False)
    for i in range(n):
        img, _, _ = ds[i]
        np.testing.assert_allclose(batch[i], img, rtol=1e-5)


def test_loader_uses_gather(tmp_path):
    rng = np.random.default_rng(1)
    images = [(rng.random((8, 8, 1)) * 255).astype(np.float32) for _ in range(10)]
    pack_shards(str(tmp_path), "train", images, [f"i{n}" for n in range(10)])
    ds = ShardedArrayDataset(str(tmp_path), split="train")
    loader = InfiniteLoader(ds, batch_size=4, start=False, shuffle=False)
    imgs, labels = next(loader)
    assert imgs.shape == (4, 8, 8, 1)
    np.testing.assert_allclose(imgs[0], images[0] / 127.5 - 1, rtol=1e-4, atol=1e-6)


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
def test_native_lib_built():
    assert native_available()
