"""CycleGAN / pix2pix training CLI.

Capability parity with the reference
``pytorch-CycleGAN-and-pix2pix/train.py`` + option system: model choice,
netG/netD variants, gan mode, lambdas, epoch schedule with linear decay,
checkpointing per epoch, loss-log printing.  Datasets: 'aligned' (AB
side-by-side images) and 'unaligned' (trainA/trainB folders), as in the
reference ``data/aligned_dataset.py`` / ``unaligned_dataset.py``.
"""

from __future__ import annotations

import os
import random
import time
from typing import List, Optional, Tuple

import click
import numpy as np


from ..data.i2i_transforms import (
    PREPROCESS_CHOICES, apply_transform, get_params, output_size,
)


def _list_images(d: str) -> List[str]:
    exts = (".png", ".jpg", ".jpeg", ".tif", ".tiff", ".bmp")
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.lower().endswith(exts)
    )


def _load_image(path: str, size: int, channels: int) -> np.ndarray:
    """Deterministic eval-time loader: plain bicubic resize, no crop/flip
    (test phase, reference ``test.py`` conventions)."""
    from PIL import Image

    img = Image.open(path)
    img = img.convert("L" if channels == 1 else "RGB")
    img = img.resize((size, size), Image.BICUBIC)
    arr = np.asarray(img, np.float32) / 127.5 - 1.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


class _PreprocessMixin:
    """Shared transform plumbing (reference ``base_dataset.get_transform``)."""

    def _setup(self, preprocess: str, load_size: int, crop_size: int,
               no_flip: bool, seed: int):
        self.preprocess = preprocess
        self.load_size = load_size
        self.crop_size = crop_size
        self.no_flip = no_flip
        self._rng = random.Random(seed)

    def _params(self, src_size):
        return get_params(self.preprocess, self.load_size, self.crop_size,
                          src_size, self._rng, self.no_flip)

    def _apply(self, img, channels: int, params) -> np.ndarray:
        img = img.convert("L" if channels == 1 else "RGB")
        img = apply_transform(img, self.preprocess, self.load_size,
                              self.crop_size, params)
        arr = np.asarray(img, np.float32) / 127.5 - 1.0
        return arr[:, :, None] if arr.ndim == 2 else arr


class UnalignedDataset(_PreprocessMixin):
    """trainA/trainB folders; random B per A; A and B draw INDEPENDENT
    crop/flip params (reference ``unaligned_dataset.py:36-37`` builds two
    param-free transforms)."""

    def __init__(self, root: str, phase: str, channels: int, seed: int = 0,
                 preprocess: str = "resize", load_size: int = 256,
                 crop_size: int = 256, no_flip: bool = False):
        self.a = _list_images(os.path.join(root, f"{phase}A"))
        self.b = _list_images(os.path.join(root, f"{phase}B"))
        assert self.a and self.b, f"no images under {root}/{phase}A|B"
        self.channels = channels
        self._setup(preprocess, load_size, crop_size, no_flip, seed)

    def __len__(self):
        return max(len(self.a), len(self.b))

    def get(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        from PIL import Image

        ia = Image.open(self.a[idx % len(self.a)])
        ib = Image.open(self.b[self._rng.randrange(len(self.b))])
        a = self._apply(ia, self.channels, self._params(ia.size))
        b = self._apply(ib, self.channels, self._params(ib.size))
        return a, b


class AlignedDataset(_PreprocessMixin):
    """Single folder of AB-concatenated images; the SAME crop/flip params
    apply to both halves (reference ``aligned_dataset.py:49-54``)."""

    def __init__(self, root: str, phase: str, channels: int, seed: int = 0,
                 preprocess: str = "resize", load_size: int = 256,
                 crop_size: int = 256, no_flip: bool = False):
        self.paths = _list_images(os.path.join(root, phase))
        assert self.paths, f"no images under {root}/{phase}"
        self.channels = channels
        self._setup(preprocess, load_size, crop_size, no_flip, seed)

    def __len__(self):
        return len(self.paths)

    def get(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        from PIL import Image

        img = Image.open(self.paths[idx % len(self.paths)])
        w, h = img.size
        a = img.crop((0, 0, w // 2, h))
        b = img.crop((w // 2, 0, w, h))
        params = self._params(a.size)
        return (self._apply(a, self.channels, params),
                self._apply(b, self.channels, params))


class ColorizationDataset(_PreprocessMixin):
    """RGB image folder -> (L, ab) CIELAB pairs (reference
    ``data/colorization_dataset.py``: A = L/50 - 1 [1ch], B = ab/110
    [2ch]); the transform runs on the RGB image before conversion
    (reference uses ``get_transform(opt, convert=False)``)."""

    def __init__(self, root: str, phase: str, channels: int = 1, seed: int = 0,
                 preprocess: str = "resize", load_size: int = 256,
                 crop_size: int = 256, no_flip: bool = False):
        self.paths = _list_images(os.path.join(root, phase))
        assert self.paths, f"no images under {root}/{phase}"
        self._setup(preprocess, load_size, crop_size, no_flip, seed)

    def __len__(self):
        return len(self.paths)

    def get(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        from PIL import Image

        from ..utils.colorspace import rgb2lab

        img = Image.open(self.paths[idx % len(self.paths)]).convert("RGB")
        img = apply_transform(img, self.preprocess, self.load_size,
                              self.crop_size, self._params(img.size))
        lab = rgb2lab(np.asarray(img, np.uint8)).astype(np.float32)
        a = lab[:, :, :1] / 50.0 - 1.0
        b = lab[:, :, 1:] / 110.0
        return a, b


@click.command()
@click.option("--dataroot", required=True)
@click.option("--name", default="experiment")
@click.option("--model", type=click.Choice(["cycle_gan", "pix2pix", "colorization",
                                            "template"]), default="cycle_gan")
@click.option("--dataset-mode", type=click.Choice(["unaligned", "aligned",
                                                   "colorization"]), default=None)
@click.option("--direction", type=click.Choice(["AtoB", "BtoA"]), default="AtoB")
@click.option("--input-nc", type=int, default=3)
@click.option("--output-nc", type=int, default=3)
@click.option("--ngf", type=int, default=64)
@click.option("--ndf", type=int, default=64)
@click.option("--netG", "netg", default=None)
@click.option("--netD", "netd", default="basic")
@click.option("--gan-mode", default=None)
@click.option("--lambda-A", "lambda_a", type=float, default=10.0)
@click.option("--lambda-B", "lambda_b", type=float, default=10.0)
@click.option("--lambda-identity", type=float, default=0.5)
@click.option("--lambda-L1", "lambda_l1", type=float, default=100.0)
@click.option("--lr", type=float, default=2e-4)
@click.option("--beta1", type=float, default=0.5)
@click.option("--pool-size", type=int, default=50)
@click.option("--lr-policy", default="linear")
@click.option("--n-epochs", type=int, default=100)
@click.option("--n-epochs-decay", type=int, default=100)
@click.option("--batch-size", type=int, default=1)
@click.option("--load-size", "load_size", type=int, default=256,
              help="scale images to this size first (reference default 286 "
                   "with --preprocess resize_and_crop)")
@click.option("--crop-size", "crop_size", type=int, default=None,
              help="then random-crop to this size (defaults to "
                   "min(load-size, 256); the network trains at this size "
                   "for crop modes)")
@click.option("--preprocess", type=click.Choice(PREPROCESS_CHOICES),
              default="resize_and_crop",
              help="train-time preprocessing (reference base_dataset.py "
                   "transform zoo; default matches the reference)")
@click.option("--no-flip", is_flag=True, default=False,
              help="disable the 50% horizontal flip")
@click.option("--checkpoints-dir", default="./checkpoints")
@click.option("--save-epoch-freq", type=int, default=5)
@click.option("--print-freq", type=int, default=100)
@click.option("--seed", type=int, default=0)
@click.option("--max-iters", type=int, default=None, help="cap iterations (smoke runs)")
def main(dataroot, name, model, dataset_mode, direction, input_nc, output_nc,
         ngf, ndf, netg, netd, gan_mode, lambda_a, lambda_b, lambda_identity,
         lambda_l1, lr, beta1, pool_size, lr_policy, n_epochs, n_epochs_decay,
         batch_size, load_size, crop_size, preprocess, no_flip,
         checkpoints_dir, save_epoch_freq, print_freq, seed, max_iters):
    """Train CycleGAN or pix2pix."""
    import jax

    from ..training.image2image import (
        ColorizationTrainer, CycleGANConfig, CycleGANTrainer, Pix2PixConfig,
        Pix2PixTrainer, RegressionConfig, RegressionTrainer,
    )
    from ..utils.checkpoint import save_checkpoint

    if model == "colorization":
        # reference colorization_model.modify_commandline_options: forces
        # the colorization dataset mode, which sets input_nc=1/output_nc=2.
        dataset_mode = "colorization"
        input_nc, output_nc = 1, 2
    dataset_mode = dataset_mode or ("unaligned" if model == "cycle_gan" else "aligned")
    netg = netg or ("resnet_9blocks" if model == "cycle_gan" else "unet_256")
    gan_mode = gan_mode or ("lsgan" if model == "cycle_gan" else "vanilla")
    crop_size = crop_size if crop_size is not None else min(load_size, 256)
    size = output_size(preprocess, load_size, crop_size)
    ds_cls = {"unaligned": UnalignedDataset, "aligned": AlignedDataset,
              "colorization": ColorizationDataset}[dataset_mode]
    ds = ds_cls(dataroot, "train", input_nc, seed, preprocess=preprocess,
                load_size=load_size, crop_size=crop_size, no_flip=no_flip)
    iters_per_epoch = max(len(ds) // batch_size, 1)
    run_dir = os.path.join(checkpoints_dir, name)
    os.makedirs(run_dir, exist_ok=True)
    print(f"{model}: {len(ds)} images, {iters_per_epoch} iters/epoch")

    if model == "cycle_gan":
        trainer = CycleGANTrainer(
            CycleGANConfig(
                input_nc=input_nc, output_nc=output_nc, ngf=ngf, ndf=ndf,
                netG=netg, netD=netd, gan_mode=gan_mode,
                lambda_a=lambda_a, lambda_b=lambda_b, lambda_identity=lambda_identity,
                lr=lr, beta1=beta1, pool_size=pool_size, lr_policy=lr_policy,
                n_epochs=n_epochs, n_epochs_decay=n_epochs_decay,
            ),
            image_size=size, iters_per_epoch=iters_per_epoch,
        )
    elif model == "template":
        trainer = RegressionTrainer(
            RegressionConfig(
                input_nc=input_nc, output_nc=output_nc, ngf=ngf, netG=netg,
                lr=lr, beta1=beta1, lr_policy=lr_policy,
                n_epochs=n_epochs, n_epochs_decay=n_epochs_decay,
            ),
            image_size=size, iters_per_epoch=iters_per_epoch,
        )
    else:
        cls = ColorizationTrainer if model == "colorization" else Pix2PixTrainer
        trainer = cls(
            Pix2PixConfig(
                input_nc=input_nc, output_nc=output_nc, ngf=ngf, ndf=ndf,
                netG=netg, netD=netd, gan_mode=gan_mode, lambda_l1=lambda_l1,
                lr=lr, beta1=beta1, lr_policy=lr_policy,
                n_epochs=n_epochs, n_epochs_decay=n_epochs_decay,
            ),
            image_size=size, iters_per_epoch=iters_per_epoch,
        )
    state = trainer.init_state(jax.random.PRNGKey(seed))

    total_iters = 0
    log = open(os.path.join(run_dir, "loss_log.txt"), "at", buffering=1)
    order = list(range(len(ds)))
    rng = random.Random(seed)
    for epoch in range(1, n_epochs + n_epochs_decay + 1):
        rng.shuffle(order)
        t0 = time.time()
        for it in range(iters_per_epoch):
            batch_a, batch_b = [], []
            for bi in range(batch_size):
                a, b = ds.get(order[(it * batch_size + bi) % len(ds)])
                if direction == "BtoA":
                    a, b = b, a
                batch_a.append(a)
                batch_b.append(b)
            state, losses = trainer.optimize_parameters(
                state, np.stack(batch_a), np.stack(batch_b)
            )
            total_iters += 1
            if total_iters % print_freq == 0:
                msg = f"(epoch {epoch}, iters {total_iters}) " + " ".join(
                    f"{k}: {v:.3f}" for k, v in losses.items()
                )
                print(msg)
                log.write(msg + "\n")
            if max_iters and total_iters >= max_iters:
                break
        print(f"End of epoch {epoch} \t Time: {time.time()-t0:.0f} sec")
        if epoch % save_epoch_freq == 0 or (max_iters and total_iters >= max_iters):
            save_checkpoint(os.path.join(run_dir, "checkpoints"), state, step=total_iters)
        if max_iters and total_iters >= max_iters:
            break
    log.close()


if __name__ == "__main__":
    main()
