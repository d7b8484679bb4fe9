"""CycleGAN / pix2pix inference CLI with an HTML results sheet.

Capability parity with the reference
``pytorch-CycleGAN-and-pix2pix/test.py`` + ``util/visualizer.py:21-51`` +
``util/html.py``: load a trained checkpoint, translate ``--num-test``
images from the test split, write per-image PNGs (``<name>_<label>.png``)
and an ``index.html`` gallery of real/fake/rec visual rows.
"""

from __future__ import annotations

import html as html_lib
import os
from typing import Dict, List

import click
import numpy as np


def _to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1,1] HWC float → uint8 (reference ``util.tensor2im``)."""
    return np.clip((img + 1) * 127.5, 0, 255).astype(np.uint8)


def _save_png(arr: np.ndarray, path: str):
    from PIL import Image

    if arr.shape[-1] == 1:
        Image.fromarray(arr[:, :, 0], "L").save(path)
    else:
        Image.fromarray(arr, "RGB").save(path)


class HTMLPage:
    """Minimal ``util/html.py`` equivalent: header + image rows."""

    def __init__(self, web_dir: str, title: str):
        self.web_dir = web_dir
        self.img_dir = os.path.join(web_dir, "images")
        os.makedirs(self.img_dir, exist_ok=True)
        self.title = title
        self.rows: List[str] = []

    def add_images(self, name: str, ims: List[str], txts: List[str], width: int = 256):
        self.rows.append(f"<h3>{html_lib.escape(name)}</h3>")
        cells = "".join(
            f'<td style="text-align:center"><a href="images/{im}">'
            f'<img src="images/{im}" width="{width}"></a><br>{html_lib.escape(t)}</td>'
            for im, t in zip(ims, txts)
        )
        self.rows.append(f"<table><tr>{cells}</tr></table>")

    def save(self):
        body = "\n".join(self.rows)
        with open(os.path.join(self.web_dir, "index.html"), "w") as f:
            f.write(f"<!DOCTYPE html><html><head><title>{html_lib.escape(self.title)}"
                    f"</title></head><body><h1>{html_lib.escape(self.title)}</h1>\n"
                    f"{body}\n</body></html>\n")


@click.command()
@click.option("--dataroot", required=True)
@click.option("--name", default="experiment")
@click.option("--model", "model_kind",
              type=click.Choice(["cycle_gan", "pix2pix", "test"]), default="cycle_gan")
@click.option("--dataset-mode", type=click.Choice(["unaligned", "aligned", "single"]),
              default=None)
@click.option("--direction", type=click.Choice(["AtoB", "BtoA"]), default="AtoB")
@click.option("--phase", default="test")
@click.option("--input-nc", type=int, default=3)
@click.option("--output-nc", type=int, default=3)
@click.option("--ngf", type=int, default=64)
@click.option("--netG", "netg", default=None)
@click.option("--load-size", "size", type=int, default=256)
@click.option("--checkpoints-dir", default="./checkpoints")
@click.option("--results-dir", default="./results")
@click.option("--num-test", type=int, default=50)
@click.option("--display-winsize", type=int, default=256)
def main(dataroot, name, model_kind, dataset_mode, direction, phase, input_nc,
         output_nc, ngf, netg, size, checkpoints_dir, results_dir, num_test,
         display_winsize):
    """Translate test images with a trained CycleGAN/pix2pix checkpoint."""
    import jax
    import jax.numpy as jnp

    from ..models.image2image import define_G
    from ..utils.checkpoint import latest_checkpoint, load_checkpoint
    from .train_i2i import AlignedDataset, UnalignedDataset, _list_images, _load_image

    dataset_mode = dataset_mode or (
        "single" if model_kind == "test"
        else ("unaligned" if model_kind == "cycle_gan" else "aligned"))
    netg = netg or ("resnet_9blocks" if model_kind != "pix2pix" else "unet_256")

    run_dir = os.path.join(checkpoints_dir, name)
    path = latest_checkpoint(os.path.join(run_dir, "checkpoints"))
    if path is not None:
        print(f"Loading {path}")
        state = load_checkpoint(path, None)
    else:
        # Reference layout: <checkpoints_dir>/<name>/latest_net_G*.pth
        # (base_model.save_networks state dicts) — convert on the fly so
        # reference-trained CycleGAN/pix2pix runs translate directly.
        from ..models.torch_compat import i2i_generator_params_from_pth

        def pth(suffix):
            return os.path.join(run_dir, f"latest_net_{suffix}.pth")

        if model_kind == "cycle_gan" and os.path.exists(pth("G_A")):
            print(f"Loading reference checkpoints {pth('G_A')} / {pth('G_B')}")
            state = {
                "params_g_a": i2i_generator_params_from_pth(pth("G_A"), netg),
                "params_g_b": i2i_generator_params_from_pth(pth("G_B"), netg),
            }
        elif model_kind != "cycle_gan" and os.path.exists(pth("G")):
            print(f"Loading reference checkpoint {pth('G')}")
            state = {"params_g": i2i_generator_params_from_pth(pth("G"), netg)}
        else:
            raise click.ClickException(
                f"no checkpoint under {run_dir}/checkpoints and no "
                f"latest_net_G*.pth in {run_dir}")

    g_a = define_G(output_nc, ngf, netg)
    fwd_a = jax.jit(lambda p, x: g_a.apply({"params": p}, x, deterministic=True))
    if model_kind == "cycle_gan":
        g_b = define_G(input_nc, ngf, netg)
        fwd_b = jax.jit(lambda p, x: g_b.apply({"params": p}, x, deterministic=True))
        p_a, p_b = state["params_g_a"], state["params_g_b"]
        if direction == "BtoA":
            p_a, p_b = p_b, p_a
            fwd_a, fwd_b = fwd_b, fwd_a
    else:
        p_a = state.get("params_g", state.get("params_g_a"))

    # Dataset (reference hard-codes batch 1, serial, no flip).
    if dataset_mode == "single":
        paths = _list_images(os.path.join(dataroot, ""))  # dataroot IS the folder
        items = [(p, None) for p in paths]
    elif dataset_mode == "unaligned":
        ds = UnalignedDataset(dataroot, phase, input_nc, seed=0,
                              preprocess="resize", load_size=size,
                              crop_size=size, no_flip=True)
        items = [(ds.a[i % len(ds.a)], None) for i in range(len(ds))]
    else:
        ds = AlignedDataset(dataroot, phase, input_nc, preprocess="resize",
                            load_size=size, crop_size=size, no_flip=True)
        items = [(p, "aligned") for p in ds.paths]

    web_dir = os.path.join(results_dir, name, f"{phase}_latest")
    page = HTMLPage(web_dir, f"Experiment = {name}, Phase = {phase}")

    for i, (path_i, kind) in enumerate(items):
        if i >= num_test:
            break
        stem = os.path.splitext(os.path.basename(path_i))[0]
        if kind == "aligned":
            a, b = ds.get(i)
            if direction == "BtoA":
                a, b = b, a
        else:
            a = _load_image(path_i, size, input_nc)
            b = None

        visuals: Dict[str, np.ndarray] = {"real_A": a}
        fake_b = np.asarray(fwd_a(p_a, jnp.asarray(a[None])))[0]
        visuals["fake_B"] = fake_b
        if model_kind == "cycle_gan":
            visuals["rec_A"] = np.asarray(fwd_b(p_b, jnp.asarray(fake_b[None])))[0]
            if b is not None:
                visuals["real_B"] = b
        elif b is not None:
            visuals["real_B"] = b

        ims, txts = [], []
        for label, img in visuals.items():
            fn = f"{stem}_{label}.png"
            _save_png(_to_uint8(img), os.path.join(page.img_dir, fn))
            ims.append(fn)
            txts.append(label)
        page.add_images(stem, ims, txts, width=display_winsize)
        if i % 5 == 0:
            print(f"processing ({i:04d})-th image... {path_i}")

    page.save()
    print(f"Results: {web_dir}/index.html")


if __name__ == "__main__":
    main()
