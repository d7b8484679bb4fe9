"""Data layer: zip-of-pickles reference-format reading (cross-checked with
the reference dataset class), sharded memmap format, infinite sampler
bit-parity, loader normalisation."""

import json
import os
import pickle
import zipfile

import numpy as np
import pytest

from gantrack_tpu.data.dataset import ShardedArrayDataset, ZipSliceDataset, open_dataset
from gantrack_tpu.data.loader import InfiniteLoader, infinite_indices
from gantrack_tpu.data.preprocess.packaging import (
    holdout_split,
    pack_shards,
    write_slice_pickles,
    write_zip,
)
from conftest import has_reference, import_reference_module

requires_reference = pytest.mark.skipif(not has_reference(), reason="reference tree not present")


@pytest.fixture(scope="module")
def pickle_zip(tmp_path_factory):
    """Build a small reference-format dataset zip."""
    tmp = tmp_path_factory.mktemp("ds")
    src = tmp / "temp"
    rng = np.random.default_rng(0)
    patients = [f"P{i:03d}" for i in range(6)]
    for p in patients:
        vol = {
            "MR_nonrigid_CT": rng.random((16, 16, 24)).astype(np.float32) * 255,
            "MR_MR_T2": rng.random((16, 16, 24)).astype(np.float32) * 255,
        }
        write_slice_pickles(str(src), p, vol, pop_range=10)
    split = holdout_split(patients, fractions={"train": 0.5, "val": 0.25, "test": 0.25})
    labels = {
        s: {f"{p}/{fn}": i % 2
            for i, p in enumerate(split[s])
            for fn in sorted(os.listdir(src / p))}
        for s in ("train", "val", "test")
    }
    out = str(tmp / "ds.zip")
    write_zip(str(src), out, split, labels=labels)
    return out


def test_zip_dataset_reads(pickle_zip):
    ds = ZipSliceDataset(pickle_zip, split="train",
                         modalities=["MR_nonrigid_CT", "MR_MR_T2"])
    assert len(ds) > 0
    img, label, fname = ds[0]
    assert img.shape == (16, 16, 2)
    assert img.dtype == np.float32
    assert fname.endswith(".pickle")
    assert ds.resolution == 16
    assert ds.num_channels == 2


def test_zip_dataset_labels_and_xflip(pickle_zip):
    ds = ZipSliceDataset(pickle_zip, split="train",
                         modalities=["MR_nonrigid_CT"], use_labels=True, xflip=True)
    n = len(ds)
    assert n % 2 == 0
    img0, label0, _ = ds[0]
    imgf, labelf, _ = ds[n // 2]
    np.testing.assert_array_equal(np.asarray(img0)[:, ::-1, :], imgf)
    assert label0.shape == (2,)
    assert label0.sum() == 1.0


@requires_reference
def test_zip_dataset_matches_reference_reader(pickle_zip):
    ref_ds_mod = import_reference_module("training.dataset_mi_multimodal")
    ref = ref_ds_mod.CustomImageFolderDataset(
        path=pickle_zip, dtype="float32", split="train", use_labels=True,
        modalities=["MR_nonrigid_CT", "MR_MR_T2"],
    )
    ours = ZipSliceDataset(pickle_zip, split="train", use_labels=True,
                           modalities=["MR_nonrigid_CT", "MR_MR_T2"])
    assert len(ref) == len(ours)
    for idx in [0, len(ours) // 2, len(ours) - 1]:
        ref_img, ref_label, ref_fname = ref[idx]
        our_img, our_label, our_fname = ours[idx]
        np.testing.assert_array_equal(np.transpose(ref_img, (1, 2, 0)), our_img)
        np.testing.assert_array_equal(ref_label, our_label)
        assert ref_fname == our_fname


def test_sharded_memmap_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    images = [rng.random((8, 8, 1)).astype(np.float32) for _ in range(10)]
    names = [f"img{i}" for i in range(10)]
    pack_shards(str(tmp_path), "train", images, names, labels=[i % 3 for i in range(10)],
                shard_size=4)
    ds = ShardedArrayDataset(str(tmp_path), split="train", use_labels=True)
    assert len(ds) == 10
    img, label, name = ds[7]
    np.testing.assert_array_equal(img, images[7])
    assert label.shape == (3,)
    assert name == "img7"


@requires_reference
def test_infinite_sampler_bit_parity():
    misc = import_reference_module("torch_utils.misc")

    class FakeDS:
        def __len__(self):
            return 37

    # torch>=2 removed Sampler.__init__(data_source); bypass the ctor.
    sampler = misc.InfiniteSampler.__new__(misc.InfiniteSampler)
    sampler.dataset = FakeDS()
    sampler.rank = 1
    sampler.num_replicas = 3
    sampler.shuffle = True
    sampler.seed = 5
    sampler.window_size = 0.5
    ref_it = iter(sampler)
    our_it = infinite_indices(37, rank=1, num_replicas=3, seed=5)
    for _ in range(200):
        assert next(ref_it) == next(our_it)


def test_loader_normalisation(pickle_zip):
    ds = ZipSliceDataset(pickle_zip, split="train", modalities=["MR_nonrigid_CT"])
    loader = InfiniteLoader(ds, batch_size=4, start=False)
    images, labels = next(loader)
    assert images.shape == (4, 16, 16, 1)
    assert images.min() >= -1.0 and images.max() <= 1.0
    assert labels.shape == (4, 0)


def test_open_dataset_dispatch(pickle_zip, tmp_path):
    ds = open_dataset(pickle_zip, split="train", modalities=["MR_nonrigid_CT"])
    assert isinstance(ds, ZipSliceDataset)
    images = [np.zeros((4, 4, 1), np.float32)] * 3
    pack_shards(str(tmp_path), "train", images, ["a", "b", "c"])
    ds2 = open_dataset(str(tmp_path), split="train")
    assert isinstance(ds2, ShardedArrayDataset)


def test_loader_multiworker_stream_deterministic(pickle_zip):
    """num_workers=4 must yield the bit-identical batch stream as
    num_workers=1 (sequence-numbered reorder buffer)."""
    def stream(workers, n=6):
        ds = ZipSliceDataset(pickle_zip, split="train",
                             modalities=["MR_nonrigid_CT"])
        loader = InfiniteLoader(ds, batch_size=4, seed=7, num_workers=workers)
        out = [next(loader) for _ in range(n)]
        loader.close()
        return out

    a, b = stream(1), stream(4)
    for (ia, la), (ib, lb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)


def test_loader_worker_error_propagates():
    """A raising dataset item must crash the consumer with the original
    error, not hang it (torch DataLoader error semantics,
    ``training_loop_mi_multimodal.py:177-179``); close() must join."""
    class PoisonDS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            if i == 13:
                raise ValueError("corrupt shard at 13")
            return np.zeros((4, 4, 1), np.float32), np.zeros(0, np.float32)

    loader = InfiniteLoader(PoisonDS(), batch_size=8, shuffle=False,
                            num_workers=2)
    with pytest.raises(RuntimeError, match="worker failed") as ei:
        for _ in range(32):
            next(loader)
    assert isinstance(ei.value.__cause__, ValueError)
    assert "corrupt shard at 13" in str(ei.value.__cause__)
    loader.close()
    assert not loader._threads


def test_loader_close_joins_workers():
    class SlowDS:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return np.zeros((4, 4, 1), np.float32), np.zeros(0, np.float32)

    loader = InfiniteLoader(SlowDS(), batch_size=4, num_workers=3)
    next(loader)
    loader.close()
    assert not loader._threads


def test_loader_process_mode_stream_deterministic(pickle_zip):
    """worker_mode='process' (spawned workers — the GIL-free path for the
    reference zip-pickle format, VERDICT r4 #9) must yield the
    bit-identical stream as single-threaded construction."""
    def stream(n=5, **kw):
        ds = ZipSliceDataset(pickle_zip, split="train",
                             modalities=["MR_nonrigid_CT"])
        loader = InfiniteLoader(ds, batch_size=4, seed=7, **kw)
        out = [next(loader) for _ in range(n)]
        loader.close()
        return out

    a = stream(num_workers=1)
    b = stream(num_workers=2, worker_mode="process")
    for (ia, la), (ib, lb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)


def test_loader_process_mode_error_propagates(pickle_zip, tmp_path):
    """A failure inside a worker *process* must surface in the consumer
    (same contract as thread mode), not hang it."""
    import shutil

    dead = str(tmp_path / "dead.zip")
    shutil.copy(pickle_zip, dead)
    ds = ZipSliceDataset(dead, split="train", modalities=["MR_nonrigid_CT"])
    ds.close()          # drop the parent's handle; children open lazily
    os.remove(dead)     # every child read now fails
    loader = InfiniteLoader(ds, batch_size=4, num_workers=2,
                            worker_mode="process")
    with pytest.raises(RuntimeError, match="worker"):
        for _ in range(8):
            next(loader)
    loader.close()
    assert not loader._procs
