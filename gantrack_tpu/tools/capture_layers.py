"""Headless per-layer activation capture for a trained generator.

Recovers the research capability of the reference GUI's layer viewer
(``/root/reference/src/models/stylegan3/viz/layer_widget.py`` +
``renderer.py``: list every synthesis layer with shape/dtype, inspect any
layer's channels as images) as a CLI that works in a display-less TPU
environment:

* default: print the layer table (name, HxW, channels, dtype) for one
  seed — the widget's left panel;
* ``--layer REGEX``: save matching layers' raw activations to
  ``<outdir>/seed####/<layer>.npy`` and (``--save-pngs``) max-abs
  normalised channel-grid PNGs — the widget's image view.

TPU-native design: one jitted forward per seed with flax
``capture_intermediates`` (no hooks/monkey-patching; XLA dead-code
eliminates nothing since every intermediate is returned).
"""

from __future__ import annotations

import os
import re
from typing import Dict, List

import click
import numpy as np

from .gen_images import parse_range


def flatten_intermediates(tree) -> Dict[str, np.ndarray]:
    """Flax ``intermediates`` collection → {"path/to/module": array}."""
    out: Dict[str, np.ndarray] = {}

    def rec(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, path if k == "__call__" else path + [k])
        elif isinstance(node, (tuple, list)):
            for i, v in enumerate(node):
                suffix = [] if len(node) == 1 else [str(i)]
                rec(v, path + suffix)
        else:
            # Keep anything shaped (jax arrays, ShapeDtypeStructs from
            # eval_shape) as-is; np.asarray would collapse abstract
            # leaves to 0-d object arrays.
            arr = node if hasattr(node, "shape") else np.asarray(node)
            name = "/".join(path)
            # Multiple outputs from one module keep first occurrence; the
            # synthesis image tensors are all unique paths anyway.
            if name not in out:
                out[name] = arr

    rec(tree, [])
    return out


def channel_grid(x: np.ndarray, max_channels: int = 64) -> np.ndarray:
    """[H, W, C] activations → uint8 grid image, per-channel max-abs
    normalised (the renderer's inf-norm scaling)."""
    h, w, c = x.shape
    c = min(c, max_channels)
    cols = int(np.ceil(np.sqrt(c)))
    rows = int(np.ceil(c / cols))
    grid = np.zeros((rows * h, cols * w), np.uint8)
    for i in range(c):
        ch = x[:, :, i]
        scale = np.max(np.abs(ch)) + 1e-8
        img = np.clip((ch / scale) * 127.5 + 127.5, 0, 255).astype(np.uint8)
        r, col = divmod(i, cols)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = img
    return grid


@click.command()
@click.option("--network", "checkpoint", required=True, help="Checkpoint path or run dir")
@click.option("--seeds", type=parse_range, default=[0], help="e.g. 0-3")
@click.option("--trunc", "truncation_psi", type=float, default=1.0)
@click.option("--layer", "layer_regex", default=None,
              help="Regex over layer names; omit to just list layers")
@click.option("--outdir", default=None, help="Required with --layer")
@click.option("--save-pngs", is_flag=True, help="Also write channel-grid PNGs")
@click.option("--max-channels", type=int, default=64)
@click.option("--resolution", type=int, default=256)
@click.option("--channels", type=int, default=1)
@click.option("--cfg", type=click.Choice(["stylegan2", "stylegan3-t", "stylegan3-r"]),
              default="stylegan2")
@click.option("--cbase", type=int, default=32768)
@click.option("--cmax", type=int, default=512)
@click.option("--map-depth", type=int, default=None)
@click.option("--z-dim", type=int, default=512)
@click.option("--w-dim", type=int, default=512)
def main(checkpoint, seeds, truncation_psi, layer_regex, outdir, save_pngs,
         max_channels, resolution, channels, cfg, cbase, cmax, map_depth,
         z_dim, w_dim):
    """List or dump per-layer generator activations for seed sweeps."""
    import jax

    from ..utils.checkpoint import resolve_network
    from .train import build_generator_from_cfg

    g = build_generator_from_cfg(
        cfg, resolution=resolution, channels=channels, c_dim=0,
        cbase=cbase, cmax=cmax, map_depth=map_depth, z_dim=z_dim, w_dim=w_dim,
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

    @jax.jit
    def capture(z):
        img, mods = g.apply(
            vars_g, z, None, truncation_psi=truncation_psi, noise_mode="const",
            capture_intermediates=lambda mdl, method: method == "__call__",
            mutable=["intermediates"],
        )
        return img, mods["intermediates"]

    pattern = re.compile(layer_regex) if layer_regex else None
    if pattern and not outdir:
        raise click.ClickException("--outdir is required with --layer")

    for si, seed in enumerate(seeds):
        z = jax.random.normal(jax.random.PRNGKey(seed), (1, g.z_dim))
        _, inter = capture(z)
        layers = flatten_intermediates(inter)
        # Keep image-like tensors [1, H, W, C] (the widget's layer list).
        layers = {k: v for k, v in layers.items() if v.ndim == 4}

        if pattern is None:
            if si == 0:
                print(f"{'layer':<48} {'HxW':>12} {'ch':>6} dtype")
                for name, arr in layers.items():
                    print(f"{name:<48} {arr.shape[1]}x{arr.shape[2]:<9} "
                          f"{arr.shape[3]:>6} {arr.dtype}")
            continue

        hits: List[str] = [n for n in layers if pattern.search(n)]
        if not hits:
            raise click.ClickException(
                f"--layer {layer_regex!r} matched nothing; run without "
                "--layer to list names")
        seed_dir = os.path.join(outdir, f"seed{seed:04d}")
        os.makedirs(seed_dir, exist_ok=True)
        for name in hits:
            # [H, W, C]; bf16 activations → f32 (numpy has no bfloat16)
            arr = np.asarray(layers[name][0], dtype=np.float32)
            fname = name.replace("/", "_")
            np.save(os.path.join(seed_dir, f"{fname}.npy"), arr)
            if save_pngs:
                from PIL import Image

                Image.fromarray(channel_grid(arr, max_channels), "L").save(
                    os.path.join(seed_dir, f"{fname}.png"))
        print(f"seed {seed}: wrote {len(hits)} layer dumps to {seed_dir}")


if __name__ == "__main__":
    main()
