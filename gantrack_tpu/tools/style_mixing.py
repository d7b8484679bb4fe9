"""Style-mixing grids (reference ``src/models/gen_images_style_mixing.py``).

Rows take coarse styles from row seeds, columns contribute fine styles
beyond ``--col-styles``; the grid visualises disentanglement.
"""

from __future__ import annotations

import os

import click
import numpy as np

from .gen_images import parse_range


@click.command()
@click.option("--network", "checkpoint", required=True)
@click.option("--rows", "row_seeds", type=parse_range, required=True)
@click.option("--cols", "col_seeds", type=parse_range, required=True)
@click.option("--col-styles", type=parse_range, default="0-6", help="w indices taken from column seeds")
@click.option("--trunc", "truncation_psi", type=float, default=1.0)
@click.option("--outdir", required=True)
@click.option("--resolution", type=int, default=256)
@click.option("--channels", type=int, default=1)
@click.option("--cfg", default="stylegan2")
@click.option("--cbase", type=int, default=32768)
@click.option("--cmax", type=int, default=512)
def main(checkpoint, row_seeds, col_seeds, col_styles, truncation_psi, outdir,
         resolution, channels, cfg, cbase, cmax):
    """Generate a style-mixing grid from a checkpoint."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..utils.checkpoint import resolve_network
    from .train import build_generator_from_cfg

    os.makedirs(outdir, exist_ok=True)
    g = build_generator_from_cfg(cfg, resolution=resolution, channels=channels,
                                 c_dim=0, cbase=cbase, cmax=cmax)
    state, path = resolve_network(checkpoint)
    if state is None:
        raise click.ClickException(f"no checkpoint found under {checkpoint}")
    vars_g = {
        "params": state["params_g_ema"],
        "emas": state["emas_g"],
        **state["consts_g"],
    }

    @jax.jit
    def mapping(z):
        return g.apply(vars_g, z, None, truncation_psi=truncation_psi,
                       method=lambda m, z, c, **kw: m.mapping(z, c, **kw))

    @jax.jit
    def synthesis(ws):
        return g.apply(vars_g, ws, noise_mode="const",
                       method=lambda m, ws, **kw: m.synthesis(ws, **kw))

    all_seeds = list(dict.fromkeys(row_seeds + col_seeds))
    zs = np.stack([np.random.RandomState(s).randn(g.z_dim) for s in all_seeds])
    ws = np.asarray(mapping(jnp.asarray(zs, jnp.float32)))
    w_by_seed = {seed: ws[i] for i, seed in enumerate(all_seeds)}

    def render(w):
        img = np.asarray(synthesis(jnp.asarray(w[None])))[0]
        return np.clip((img + 1) * 127.5, 0, 255).astype(np.uint8)

    images = {}
    for rs in row_seeds:
        for cs in col_seeds:
            w = w_by_seed[rs].copy()
            w[col_styles] = w_by_seed[cs][col_styles]
            images[(rs, cs)] = render(w)

    # Assemble grid with source row/col headers.
    h = w_img = resolution
    canvas = np.zeros(((len(row_seeds) + 1) * h, (len(col_seeds) + 1) * w_img, channels), np.uint8)
    for j, cs in enumerate(col_seeds):
        canvas[0:h, (j + 1) * w_img:(j + 2) * w_img] = render(w_by_seed[cs])
    for i, rs in enumerate(row_seeds):
        canvas[(i + 1) * h:(i + 2) * h, 0:w_img] = render(w_by_seed[rs])
        for j, cs in enumerate(col_seeds):
            canvas[(i + 1) * h:(i + 2) * h, (j + 1) * w_img:(j + 2) * w_img] = images[(rs, cs)]

    out = os.path.join(outdir, "style_mixing_grid.png")
    if channels == 1:
        Image.fromarray(canvas[:, :, 0], "L").save(out)
    else:
        Image.fromarray(canvas, "RGB").save(out)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
