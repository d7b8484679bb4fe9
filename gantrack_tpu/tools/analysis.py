"""Run-directory analysis utilities.

Capability parity with the reference analysis scripts:
``src/metrics/analyze_metrics.py`` (parse metric jsonl, trend),
``src/misc/analyze_gan.py:21-108`` (best-snapshot selection, FID-vs-kimg
plots), ``src/metrics/create_bashloop.py`` (batch metric runner
emission), ``genlib/run_recursively_clean.py`` (run-dir cleanup).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from typing import Dict, List, Optional, Tuple

import click
import numpy as np


def load_metric_jsonl(path: str) -> List[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def metric_trend(run_dir: str, metric: str = "fid50k_full",
                 mode: Optional[str] = None) -> List[Tuple[str, float]]:
    """(snapshot, value) pairs from ``metric-*.jsonl``."""
    name = f"metric-{mode}-{metric}.jsonl" if mode else f"metric-{metric}.jsonl"
    path = os.path.join(run_dir, name)
    if not os.path.exists(path):
        candidates = glob.glob(os.path.join(run_dir, f"metric-*{metric}.jsonl"))
        if not candidates:
            return []
        path = candidates[0]
    out = []
    for rec in load_metric_jsonl(path):
        value = rec["results"].get(metric)
        if value is not None:
            out.append((rec.get("snapshot_path") or "", float(value)))
    return out


def best_snapshot(run_dir: str, metric: str = "fid50k_full",
                  mode: Optional[str] = None, minimize: bool = True
                  ) -> Optional[Tuple[str, float]]:
    """Best snapshot by metric (reference ``analyze_gan.py:21-53``)."""
    trend = metric_trend(run_dir, metric, mode)
    if not trend:
        return None
    key = min if minimize else max
    return key(trend, key=lambda t: t[1])


def plot_trend(run_dir: str, metric: str, out_path: str,
               mode: Optional[str] = None) -> Optional[str]:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    trend = metric_trend(run_dir, metric, mode)
    if not trend:
        return None
    values = [v for _, v in trend]
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(values, marker="o")
    ax.set_xlabel("snapshot")
    ax.set_ylabel(metric)
    ax.set_title(os.path.basename(run_dir))
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def emit_metric_loop(run_dir: str, data: str, metrics: str = "fid10k") -> str:
    """Emit a shell script evaluating every checkpoint (reference
    ``create_bashloop.py``)."""
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    lines = ["#!/bin/bash", "set -e"]
    for entry in sorted(os.listdir(ckpt_dir)) if os.path.isdir(ckpt_dir) else []:
        if entry.startswith("state-"):
            lines.append(
                f"python -m gantrack_tpu.tools.calc_metrics "
                f"--network={os.path.join(ckpt_dir, entry)} --metrics={metrics} --data={data}"
            )
    out = os.path.join(run_dir, "run_metrics.sh")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.chmod(out, 0o755)
    return out


def clean_run_dir(run_dir: str, keep_snapshots: Optional[List[str]] = None,
                  dry_run: bool = True, metric: str = "fid50k_full",
                  mode: Optional[str] = None,
                  minimize: Optional[bool] = None) -> List[str]:
    """Delete all but whitelisted checkpoints (reference
    ``run_recursively_clean.py``).  Always keeps the latest snapshot and
    the best one by ``metric`` (when that metric was recorded).
    ``minimize`` defaults by metric family: equivariance PSNRs (eq*) and
    precision/recall/IS are higher-is-better; FID/KID/PPL lower."""
    if minimize is None:
        minimize = not metric.startswith(("eq", "pr", "is", "precision", "recall"))
    keep = set(keep_snapshots or [])
    best = best_snapshot(run_dir, metric, mode, minimize=minimize)
    if best and best[0]:
        keep.add(os.path.basename(best[0]))
    removed = []
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    if os.path.isdir(ckpt_dir):
        entries = sorted(e for e in os.listdir(ckpt_dir) if e.startswith("state-"))
        for entry in entries[:-1]:  # always keep the latest
            if entry not in keep:
                removed.append(os.path.join(ckpt_dir, entry))
                if not dry_run:
                    shutil.rmtree(os.path.join(ckpt_dir, entry))
    return removed


@click.command()
@click.option("--run-dir", required=True)
@click.option("--metric", default="fid50k_full")
@click.option("--mode", default=None)
@click.option("--plot", "plot_path", default=None)
def main(run_dir, metric, mode, plot_path):
    """Report metric trend + best snapshot for a run dir."""
    trend = metric_trend(run_dir, metric, mode)
    for snap, value in trend:
        print(f"{os.path.basename(snap) if snap else '?':>20}  {value:.4f}")
    best = best_snapshot(run_dir, metric, mode)
    if best:
        print(f"best: {best[0]} = {best[1]:.4f}")
    if plot_path:
        plot_trend(run_dir, metric, plot_path, mode)
        print(f"plot: {plot_path}")


if __name__ == "__main__":
    main()
