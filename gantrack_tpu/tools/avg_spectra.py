"""Average power-spectra analysis (alias detection).

Capability parity with the reference ``avg_spectra.py``: accumulate
windowed FFT power spectra over reals and generated samples, plot/save
azimuthally-averaged slices for comparison.
"""

from __future__ import annotations

import os
from typing import Optional

import click
import numpy as np


def compute_spectrum_batch(images: np.ndarray, beta: float = 8.0) -> np.ndarray:
    """Mean 2D power spectrum of [N,H,W] images with a Kaiser window
    (reference avg_spectra.py stats accumulation)."""
    n, h, w = images.shape
    window = np.kaiser(h, beta)[:, None] * np.kaiser(w, beta)[None, :]
    window = window / np.sqrt(np.mean(np.square(window)))
    spec = np.zeros((h, w), np.float64)
    for img in images:
        f = np.fft.fftshift(np.fft.fft2(img * window))
        spec += np.square(np.abs(f)) / (h * w)
    return spec / n


def azimuthal_average(spectrum: np.ndarray, num_bins: Optional[int] = None):
    """Radially averaged 1-D spectrum (reference azimuthal integration)."""
    h, w = spectrum.shape
    cy, cx = h // 2, w // 2
    y, x = np.indices((h, w))
    r = np.hypot(y - cy, x - cx)
    num_bins = num_bins or min(cy, cx)
    bins = np.clip((r / r[cy, 0] * num_bins).astype(int), 0, num_bins)
    sums = np.bincount(bins.ravel(), weights=spectrum.ravel(), minlength=num_bins + 1)
    counts = np.bincount(bins.ravel(), minlength=num_bins + 1)
    return sums[:num_bins] / np.maximum(counts[:num_bins], 1)


@click.command()
@click.option("--network", "checkpoint", required=True)
@click.option("--data", required=True)
@click.option("--split", default="train")
@click.option("--modalities", default=None)
@click.option("--num", type=int, default=256, help="samples per side")
@click.option("--outdir", required=True)
@click.option("--resolution", type=int, default=256)
@click.option("--channels", type=int, default=1)
@click.option("--cfg", default="stylegan2")
@click.option("--cbase", type=int, default=32768)
@click.option("--cmax", type=int, default=512)
def main(checkpoint, data, split, modalities, num, outdir, resolution, channels,
         cfg, cbase, cmax):
    """Compare real vs generated average power spectra."""
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..data.dataset import open_dataset
    from ..utils.checkpoint import resolve_network
    from .train import build_generator_from_cfg

    os.makedirs(outdir, exist_ok=True)
    kwargs = dict(split=split)
    if data.endswith(".zip") and modalities:
        kwargs["modalities"] = modalities.split(",")
    ds = open_dataset(data, **kwargs)
    reals = np.stack([ds[i][0][..., 0] for i in range(min(num, len(ds)))])
    reals = reals / 127.5 - 1

    g = build_generator_from_cfg(cfg, resolution=ds.resolution, channels=ds.num_channels,
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
    def sample(z):
        return g.apply(vars_g, z, None, noise_mode="const")

    fakes = []
    for i in range(0, num, 32):
        z = jax.random.normal(jax.random.PRNGKey(i), (min(32, num - i), g.z_dim))
        fakes.append(np.asarray(sample(z))[..., 0])
    fakes = np.concatenate(fakes)

    spec_real = compute_spectrum_batch(reals)
    spec_fake = compute_spectrum_batch(fakes)
    az_real = azimuthal_average(spec_real)
    az_fake = azimuthal_average(spec_fake)

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    axes[0].imshow(np.log10(spec_real + 1e-12), cmap="magma")
    axes[0].set_title("real")
    axes[1].imshow(np.log10(spec_fake + 1e-12), cmap="magma")
    axes[1].set_title("generated")
    axes[2].semilogy(az_real, label="real")
    axes[2].semilogy(az_fake, label="generated")
    axes[2].legend()
    axes[2].set_title("azimuthal average")
    fig.savefig(os.path.join(outdir, "avg_spectra.png"), dpi=120, bbox_inches="tight")
    np.savez(os.path.join(outdir, "spectra.npz"),
             spec_real=spec_real, spec_fake=spec_fake,
             az_real=az_real, az_fake=az_fake)
    print(f"Wrote {outdir}/avg_spectra.png")


if __name__ == "__main__":
    main()
