"""Dataset statistics reports.

Capability parity with the reference ``src/data/analyze_dataset.py`` and
``dataset_analysis_percentile.py``: per-volume shape/spacing/intensity
stats exported to a spreadsheet/CSV, and percentile search for the
intensity-normalisation ranges (with optional histogram/KDE plots).
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional

import click
import numpy as np


def volume_stats(path: str) -> dict:
    from ..data.preprocess.nifti import read_nifti

    vol, zooms = read_nifti(path)
    v = np.asarray(vol, np.float64)
    return {
        "file": os.path.basename(path),
        "shape": "x".join(map(str, vol.shape)),
        "spacing": "x".join(f"{z:.3f}" for z in zooms),
        "min": float(v.min()),
        "max": float(v.max()),
        "mean": float(v.mean()),
        "std": float(v.std()),
        "p01": float(np.percentile(v, 1)),
        "p99": float(np.percentile(v, 99)),
    }


def percentile_search(paths: List[str], lower_pct: float = 1.0, upper_pct: float = 99.0,
                      sample_per_volume: int = 200000, seed: int = 0) -> dict:
    """Pooled percentile estimate over a dataset (reference
    ``dataset_analysis_percentile.py``)."""
    from ..data.preprocess.nifti import read_nifti

    rng = np.random.default_rng(seed)
    samples = []
    for p in paths:
        vol, _ = read_nifti(p)
        flat = np.asarray(vol).ravel()
        idx = rng.choice(flat.size, min(sample_per_volume, flat.size), replace=False)
        samples.append(flat[idx].astype(np.float64))
    pooled = np.concatenate(samples)
    return {
        "lower": float(np.percentile(pooled, lower_pct)),
        "upper": float(np.percentile(pooled, upper_pct)),
        "n_volumes": len(paths),
        "n_samples": int(pooled.size),
    }


@click.command()
@click.option("--source", required=True, help="directory of NIfTI volumes")
@click.option("--out", "out_path", required=True, help="output CSV/XLSX")
@click.option("--percentiles", type=(float, float), default=(1.0, 99.0))
@click.option("--plot", "plot_path", default=None, help="optional histogram PNG")
def main(source, out_path, percentiles, plot_path):
    """Report per-volume stats and pooled normalisation percentiles."""
    import pandas as pd

    paths = sorted(glob.glob(os.path.join(source, "**", "*.nii*"), recursive=True))
    if not paths:
        raise click.ClickException(f"no NIfTI volumes under {source}")
    rows = [volume_stats(p) for p in paths]
    df = pd.DataFrame(rows)
    if out_path.endswith(".xlsx"):
        df.to_excel(out_path, index=False)
    else:
        df.to_csv(out_path, index=False)
    print(df.describe().loc[["mean", "min", "max"]])

    pr = percentile_search(paths, percentiles[0], percentiles[1])
    print(f"normalisation range (p{percentiles[0]:g}..p{percentiles[1]:g}): "
          f"[{pr['lower']:.1f}, {pr['upper']:.1f}] over {pr['n_volumes']} volumes")

    if plot_path:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from ..data.preprocess.nifti import read_nifti

        pooled = np.concatenate([
            np.asarray(read_nifti(p)[0]).ravel()[::50] for p in paths[:20]
        ])
        fig, ax = plt.subplots(figsize=(7, 4))
        ax.hist(pooled, bins=200, density=True)
        ax.axvline(pr["lower"], color="r", ls="--")
        ax.axvline(pr["upper"], color="r", ls="--")
        ax.set_title("intensity distribution")
        fig.savefig(plot_path, dpi=120, bbox_inches="tight")
        print(f"plot: {plot_path}")


if __name__ == "__main__":
    main()
