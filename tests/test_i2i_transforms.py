"""i2i train-time preprocessing zoo vs the reference contract.

Reference: ``pytorch-CycleGAN-and-pix2pix/data/base_dataset.py:62-148``
(get_params/get_transform + __scale_width/__crop/__flip/__make_power_2).
torchvision is absent in this image, so the oracle is the transcribed
arithmetic of those helpers (they are pure PIL one-liners), not an
executed torch pipeline; the aligned-shared / unaligned-independent param
semantics mirror ``aligned_dataset.py:49-54`` / ``unaligned_dataset.py:36-37``.
"""

import random

import numpy as np
import pytest

from PIL import Image

from gantrack_tpu.data.i2i_transforms import (
    apply_transform, get_params, output_size,
)


def _img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8), "RGB")


def test_resize_and_crop_geometry():
    img = _img(70, 50)
    params = {"crop_pos": (3, 5), "flip": False}
    out = apply_transform(img, "resize_and_crop", 36, 32, params)
    assert out.size == (32, 32)
    # the crop must be a window of the resized image at (3, 5)
    resized = img.resize((36, 36), Image.BICUBIC)
    want = resized.crop((3, 5, 35, 37))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_crop_mode_no_resize():
    img = _img(64, 48)
    out = apply_transform(img, "crop", 256, 32, {"crop_pos": (10, 7), "flip": False})
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(img.crop((10, 7, 42, 39))))


def test_crop_noop_when_source_small():
    # reference __crop returns the image untouched when ow<=tw and oh<=th
    img = _img(16, 16)
    out = apply_transform(img, "crop", 256, 32, {"crop_pos": (0, 0), "flip": False})
    assert out.size == (16, 16)


def test_scale_width_aspect():
    img = _img(100, 40)
    out = apply_transform(img, "scale_width", 50, 8, None)
    # h = max(50*40/100, 8) = 20 (reference __scale_width)
    assert out.size == (50, 20)
    # height floored at crop_size
    out = apply_transform(img, "scale_width", 50, 32, None)
    assert out.size == (50, 32)
    # already at target: untouched
    img2 = _img(50, 60)
    assert apply_transform(img2, "scale_width", 50, 32, None).size == (50, 60)


def test_scale_width_and_crop():
    img = _img(100, 80)
    params = {"crop_pos": (2, 4), "flip": False}
    out = apply_transform(img, "scale_width_and_crop", 64, 32, params)
    assert out.size == (32, 32)
    scaled = img.resize((64, max(64 * 80 // 100, 32)), Image.BICUBIC)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(scaled.crop((2, 4, 34, 36))))


def test_none_rounds_to_multiple_of_4():
    assert apply_transform(_img(30, 41), "none", 0, 0, None).size == (32, 40)
    # already a multiple: untouched (no resample blur)
    img = _img(32, 40)
    np.testing.assert_array_equal(
        np.asarray(apply_transform(img, "none", 0, 0, None)), np.asarray(img))


def test_flip():
    img = _img(8, 8)
    out = apply_transform(img, "resize", 8, 8, {"crop_pos": (0, 0), "flip": True})
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(img)[:, ::-1])


def test_get_params_ranges_and_flip_gate():
    rng = random.Random(0)
    for _ in range(50):
        p = get_params("resize_and_crop", 286, 256, (123, 99), rng)
        x, y = p["crop_pos"]
        assert 0 <= x <= 30 and 0 <= y <= 30
    assert any(get_params("resize_and_crop", 286, 256, (300, 300),
                          rng)["flip"] for _ in range(20))
    assert not any(get_params("resize_and_crop", 286, 256, (300, 300),
                              rng, no_flip=True)["flip"] for _ in range(20))
    # crop/scale_width_and_crop draw positions from the SOURCE/scaled dims
    p = get_params("crop", 286, 32, (64, 48), random.Random(1))
    assert p["crop_pos"][0] <= 32 and p["crop_pos"][1] <= 16
    p = get_params("scale_width_and_crop", 64, 32, (100, 80), random.Random(2))
    assert p["crop_pos"][0] <= 32 and p["crop_pos"][1] <= 64 * 80 // 100 - 32 + 1


def test_output_size():
    assert output_size("resize_and_crop", 286, 256) == 256
    assert output_size("scale_width_and_crop", 286, 256) == 256
    assert output_size("crop", 286, 256) == 256
    assert output_size("resize", 256, 999) == 256
    assert output_size("scale_width", 256, 128) == 256


def test_aligned_shares_params_unaligned_independent(tmp_path):
    from gantrack_tpu.tools.train_i2i import AlignedDataset, UnalignedDataset

    rng = np.random.default_rng(0)
    # AB image whose two halves are identical -> shared params give a == b
    half = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
    ab = np.concatenate([half, half], axis=1)
    d = tmp_path / "train"
    d.mkdir()
    Image.fromarray(ab, "RGB").save(d / "ab.png")
    ds = AlignedDataset(str(tmp_path), "train", 3, seed=0,
                        preprocess="resize_and_crop", load_size=36, crop_size=32)
    for i in range(6):
        a, b = ds.get(i)
        assert a.shape == (32, 32, 3)
        np.testing.assert_array_equal(a, b)

    for side in ("trainA", "trainB"):
        sd = tmp_path / side
        sd.mkdir()
        Image.fromarray(half, "RGB").save(sd / "im.png")
    ds = UnalignedDataset(str(tmp_path), "train", 3, seed=0,
                          preprocess="resize_and_crop", load_size=36, crop_size=32)
    # same source image on both sides: independent params must eventually
    # produce differing outputs
    diffs = sum(not np.array_equal(*ds.get(i)) for i in range(12))
    assert diffs > 0


def test_train_i2i_cli_crop_pipeline(tmp_path):
    """--preprocess resize_and_crop trains the nets at crop_size (the
    reference's load 286 -> crop 256 recipe, scaled down)."""
    from click.testing import CliRunner

    from gantrack_tpu.tools.train_i2i import main as train_main

    rng = np.random.default_rng(0)
    for side in "AB":
        d = tmp_path / "data" / f"train{side}"
        d.mkdir(parents=True)
        for i in range(2):
            Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8),
                            "RGB").save(d / f"im{i}.png")
    r = CliRunner().invoke(train_main, [
        "--dataroot", str(tmp_path / "data"), "--name", "t",
        "--model", "cycle_gan", "--ngf", "8", "--ndf", "8",
        "--preprocess", "resize_and_crop", "--load-size", "36",
        "--crop-size", "32", "--batch-size", "1", "--max-iters", "1",
        "--n-epochs", "1", "--n-epochs-decay", "0",
        "--checkpoints-dir", str(tmp_path / "ckpt"),
    ], catch_exceptions=False)
    assert r.exit_code == 0, r.output
