"""CycleGAN/pix2pix train-time preprocessing zoo.

Capability parity with the reference
``pytorch-CycleGAN-and-pix2pix/data/base_dataset.py:62-148``:

* ``resize_and_crop`` (the reference default): resize to
  ``load_size``² → random ``crop_size``² crop,
* ``crop``: random crop straight from the source,
* ``scale_width`` / ``scale_width_and_crop``: width-pinned aspect
  resize (height floored at ``crop_size``), optional crop,
* ``resize``: plain bicubic square resize,
* ``none``: round each side to a multiple of 4,

plus the 50% horizontal flip.  Random parameters are drawn once per
sample (``get_params``, reference ``:62-78``) so aligned A/B pairs share
the identical crop/flip while unaligned sides draw independently
(reference ``aligned_dataset.py:49-54`` vs ``unaligned_dataset.py:36-37``).
"""

from __future__ import annotations

import random
from typing import Dict, Optional, Tuple

PREPROCESS_CHOICES = (
    "resize_and_crop", "crop", "scale_width", "scale_width_and_crop",
    "resize", "none",
)


def get_params(
    preprocess: str,
    load_size: int,
    crop_size: int,
    src_size: Tuple[int, int],
    rng: random.Random,
    no_flip: bool = False,
) -> Dict[str, object]:
    """Draw the per-sample crop position and flip bit (reference
    ``base_dataset.get_params``).  ``src_size`` is the PIL ``(w, h)``."""
    w, h = src_size
    new_w, new_h = w, h
    if preprocess == "resize_and_crop":
        new_w = new_h = load_size
    elif preprocess == "scale_width_and_crop":
        new_w = load_size
        new_h = load_size * h // w
    x = rng.randint(0, max(0, new_w - crop_size))
    y = rng.randint(0, max(0, new_h - crop_size))
    flip = (not no_flip) and rng.random() > 0.5
    return {"crop_pos": (x, y), "flip": flip}


def apply_transform(
    img,
    preprocess: str,
    load_size: int,
    crop_size: int,
    params: Optional[Dict[str, object]] = None,
    method=None,
):
    """Apply the reference transform chain to a PIL image and return a PIL
    image (conversion to arrays is the caller's job — the reference's
    ToTensor+Normalize((0.5,),(0.5,)) is exactly ``arr/127.5 - 1``)."""
    from PIL import Image

    if method is None:
        method = Image.BICUBIC
    if "resize" in preprocess:
        img = img.resize((load_size, load_size), method)
    elif "scale_width" in preprocess:
        ow, oh = img.size
        if not (ow == load_size and oh >= crop_size):
            img = img.resize(
                (load_size, max(load_size * oh // ow, crop_size)), method)
    if "crop" in preprocess:
        ow, oh = img.size
        if ow > crop_size or oh > crop_size:
            x, y = params["crop_pos"]
            img = img.crop((x, y, x + crop_size, y + crop_size))
    if preprocess == "none":
        ow, oh = img.size
        w4, h4 = int(round(ow / 4) * 4), int(round(oh / 4) * 4)
        if (w4, h4) != (ow, oh):
            img = img.resize((w4, h4), method)
    if params is not None and params.get("flip"):
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    return img


def output_size(preprocess: str, load_size: int, crop_size: int) -> int:
    """The square side the network sees for a given preprocess mode."""
    return crop_size if "crop" in preprocess else load_size
