"""claro TIFF-stage preparation runner.

Rebuilds the reference's interactive prep script
(``src/data/dataset_preparation.py:1-166``): intersect the patient-info
table with the lung-box annotation table, push every annotated slice
through the claro per-slice pipeline (box-crop → resize → clip →
normalise, ``util_medical_data.py:111-134``), and export per-slice
images into an interim directory for the downstream ``dataset_tool``
stages.

Differences from the reference, by design:

* The ``input()``-gated "develop" mode (``dataset_preparation.py:48-50``)
  becomes an explicit ``--interactive`` flag — batch jobs must never
  block on a TTY.
* Tables load from CSV natively; ``.xlsx`` is supported when ``openpyxl``
  is importable (absent in this image — the reference hard-requires it).
* Box lists are parsed with ``ast.literal_eval``, not ``eval``
  (reference ``util_medical_data.py:156``).
"""

from __future__ import annotations

import ast
import os
from typing import Dict, Optional

import click
import numpy as np


def _read_table(path: str):
    """CSV (native) or XLSX (when openpyxl is available) → DataFrame."""
    import pandas as pd

    if path.lower().endswith((".xlsx", ".xls")):
        try:
            return pd.read_excel(path, dtype=str)
        except ImportError as e:  # openpyxl not in this image
            raise click.ClickException(
                f"{path}: .xlsx needs openpyxl (not installed); "
                "export the sheet to .csv instead"
            ) from e
    return pd.read_csv(path, dtype=str)


def _load_boxes(path: Optional[str], box_value: str) -> Optional[Dict[str, list]]:
    """'img ID' → box list, reference ``util_medical_data.py:154-158``."""
    if path is None:
        return None
    tab = _read_table(path)
    if "img ID" not in tab.columns or box_value not in tab.columns:
        raise click.ClickException(
            f"box file {path} needs columns 'img ID' and {box_value!r}; "
            f"found {list(tab.columns)}"
        )
    return {
        os.path.basename(str(r["img ID"])): ast.literal_eval(str(r[box_value]))
        for _, r in tab.iterrows()
    }


@click.command()
@click.option("--config", "config_path", type=str, default=None,
              help="YAML config (configs/claro_preprocessing.yaml layout)")
@click.option("--source", required=True,
              help="Raw data dir: <patient>/images/<patient>_<slice>.tif")
@click.option("--dest", required=True, help="Interim output root")
@click.option("--patients-info", "patients_info", required=True,
              help="Table with an 'image' column of <dir>/<patient>_<slice>.tif rows")
@click.option("--box-file", "box_file", default=None,
              help="Table keyed 'img ID' with a box-list column")
@click.option("--box-value", default="box lung", show_default=True)
@click.option("--resolution", type=int, default=512)
@click.option("--clip-min", type=float, default=-1000.0)
@click.option("--clip-max", type=float, default=1000.0)
@click.option("--convert-to-uint8", is_flag=True, default=False,
              help="Export uint8 PNG instead of float TIFF")
@click.option("--max-slices", type=int, default=None, help="Debug cap")
@click.option("--seed", type=int, default=42)
@click.option("--interactive", is_flag=True, default=False,
              help="Confirm the resolved config on stdin before running")
def main(config_path, source, dest, patients_info, box_file, box_value,
         resolution, clip_min, clip_max, convert_to_uint8, max_slices,
         seed, interactive):
    """Prepare the claro TIFF stage (reference dataset_preparation.py)."""
    from PIL import Image

    from ..data.preprocess.medical import load_slice
    from ..utils.config import Logger, allocate_run_dir, dump_options, load_yaml

    cfg = load_yaml(config_path) if config_path else {}
    data_cfg = dict(cfg.get("data", {}))
    resolution = int(data_cfg.get("image_size", resolution))
    clip = {"min": float(data_cfg.get("clip_min", clip_min)),
            "max": float(data_cfg.get("clip_max", clip_max))}

    import json

    opts = dict(source=source, dest=dest, patients_info=patients_info,
                box_file=box_file, box_value=box_value, resolution=resolution,
                clip=clip, convert_to_uint8=convert_to_uint8, seed=seed,
                config=dict(cfg))
    print(json.dumps(opts, indent=2))
    # Confirm BEFORE allocating the run dir, so an aborted attempt leaves
    # nothing behind (reference dataset_preparation.py gates with input()
    # before its submit-run block).
    if interactive and input("run with the config above? [y/N] ") != "y":
        print("aborted")
        return
    run_dir = allocate_run_dir(os.path.join(dest, "runs"), "prepare_dataset")
    Logger(os.path.join(run_dir, "log.txt"))
    print(json.dumps(opts, indent=2))  # into log.txt too
    dump_options(run_dir, opts, name="configuration.json")
    np.random.seed(seed)

    # Patient/box intersection (reference dataset_preparation.py:136-146).
    info = _read_table(patients_info)
    if "image" not in info.columns:
        raise click.ClickException(
            f"{patients_info} needs an 'image' column; found {list(info.columns)}")
    slice_ids = [os.path.basename(str(p)).split(".tif")[0]
                 for p in info["image"]]
    boxes = _load_boxes(box_file, box_value)
    if boxes is not None:
        slice_ids = sorted(np.intersect1d(slice_ids, list(boxes)))
    print(f"Number of images: {len(slice_ids)}")
    print(f"Number of patients: {len({s.split('_')[0] for s in slice_ids})}")

    out_dir = os.path.join(dest, "images")
    os.makedirs(out_dir, exist_ok=True)
    scale = dict(clip)
    todo = slice_ids[:max_slices]
    for n, sid in enumerate(todo):
        patient = sid.split("_")[0]
        img_path = os.path.join(source, patient, "images", f"{sid}.tif")
        img = np.asarray(Image.open(img_path)).astype(np.float64)
        x = load_slice(
            img, img_dim=resolution,
            box=None if boxes is None else boxes[sid],
            clip=clip, scale=scale,
            convert_to_uint8=convert_to_uint8, scale_by_255=True,
        )
        im = Image.fromarray(x)
        if convert_to_uint8:
            assert im.mode == "L"
            im.save(os.path.join(out_dir, f"{sid}.png"),
                    compress_level=0, optimize=False)
        else:
            im.save(os.path.join(out_dir, f"{sid}.tif"), "tiff")
        if (n + 1) % 200 == 0:
            print(f"{n + 1}/{len(todo)} slices")
    print(f"done: {len(todo)} slices → {out_dir}")


if __name__ == "__main__":
    main()
