"""Latent interpolation videos (reference ``gen_video.py``).

Renders a grid of seeds smoothly interpolated along a latent loop and
writes frames (PNG sequence) plus an optional GIF (no ffmpeg dependency
in this environment; imageio handles GIF natively).
"""

from __future__ import annotations

import os
from typing import List

import click
import numpy as np

from .gen_images import parse_range


@click.command()
@click.option("--network", "checkpoint", required=True)
@click.option("--seeds", type=parse_range, required=True)
@click.option("--grid", "grid_dims", default="2x2", help="WxH seed grid")
@click.option("--num-keyframes", type=int, default=None)
@click.option("--w-frames", type=int, default=30, help="frames per keyframe transition")
@click.option("--trunc", "truncation_psi", type=float, default=1.0)
@click.option("--output", required=True, help="output dir (frames) or .gif path")
@click.option("--resolution", type=int, default=256)
@click.option("--channels", type=int, default=1)
@click.option("--cfg", default="stylegan2")
@click.option("--cbase", type=int, default=32768)
@click.option("--cmax", type=int, default=512)
def main(checkpoint, seeds, grid_dims, num_keyframes, w_frames, truncation_psi,
         output, resolution, channels, cfg, cbase, cmax):
    """Render a latent-interpolation video grid."""
    import jax
    import jax.numpy as jnp
    import scipy.interpolate

    from ..utils.checkpoint import resolve_network
    from .train import build_generator_from_cfg

    gw, gh = (int(v) for v in grid_dims.split("x"))
    if num_keyframes is None:
        num_keyframes = len(seeds) // (gw * gh)
    assert num_keyframes >= 1, "need at least grid-size seeds"

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

    # Keyframe ws per grid cell; smooth periodic cubic spline through them
    # (reference gen_video.py:28-60).
    zs = np.stack([
        np.random.RandomState(seed).randn(g.z_dim) for seed in seeds[: gw * gh * num_keyframes]
    ]).reshape(gh, gw, num_keyframes, g.z_dim)
    ws = np.asarray(mapping(jnp.asarray(zs.reshape(-1, g.z_dim))))
    ws = ws.reshape(gh, gw, num_keyframes, *ws.shape[1:])

    interps = {}
    for yi in range(gh):
        for xi in range(gw):
            w = ws[yi, xi]
            loop = np.concatenate([w, w[:1]])
            x = np.arange(len(loop))
            # cubic needs >=4 knots; short loops (1-2 keyframes) lerp
            kind = "cubic" if len(loop) >= 4 else "linear"
            interps[(yi, xi)] = scipy.interpolate.interp1d(x, loop, kind=kind, axis=0)

    frames: List[np.ndarray] = []
    total = num_keyframes * w_frames
    for fi in range(total):
        t = fi / w_frames
        grid_rows = []
        for yi in range(gh):
            row = []
            for xi in range(gw):
                w = interps[(yi, xi)](t % num_keyframes)
                img = np.asarray(synthesis(jnp.asarray(w[None])))[0]
                row.append(img)
            grid_rows.append(np.concatenate(row, axis=1))
        frame = np.concatenate(grid_rows, axis=0)
        frame = np.clip((frame + 1) * 127.5, 0, 255).astype(np.uint8)
        frames.append(frame[..., 0] if channels == 1 else frame)

    if output.endswith(".gif"):
        import imageio

        imageio.mimsave(output, frames, fps=30)
        print(f"wrote {output} ({len(frames)} frames)")
    else:
        os.makedirs(output, exist_ok=True)
        from PIL import Image

        for i, fr in enumerate(frames):
            Image.fromarray(fr).save(os.path.join(output, f"frame{i:05d}.png"))
        print(f"wrote {len(frames)} frames to {output}")


if __name__ == "__main__":
    main()
