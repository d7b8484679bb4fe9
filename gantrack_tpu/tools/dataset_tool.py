"""Offline preprocessing CLI — the reference ``dataset_tool_mi.py`` equivalent.

Processing steps (``--processing_step``), mirroring
``src/data/dataset_tool_mi.py:1005-1248``:

* ``process_dicom_2_nifti`` — DICOM series → NIfTI (requires dicom2nifti;
  gated, absent in this environment).
* ``process_nifti_resized``  — respace volumes (scipy linear resample).
* ``process_nifti_normalized`` — per-mode HU clip + [0,255] rescale.
* ``mask_nifti``            — body-mask extraction.
* ``process_tiff``          — claro per-slice TIFF path: box crop →
  resize → clip → normalise (BASELINE config 1).
* ``snap_pickle``           — slice volumes to per-patient pickles.
* ``snap_zip``              — deterministic patient split + zip packaging.
* ``pack``                  — TPU-native sharded-memmap training format.

Each invocation allocates a run dir, snapshots the YAML config, and logs
to ``log.txt`` (reference ``:1031-1047``).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from typing import Optional

import click
import numpy as np

STEPS = [
    "process_dicom_2_nifti",
    "process_nifti_resized",
    "process_nifti_normalized",
    "mask_nifti",
    "process_tiff",
    "snap_pickle",
    "snap_zip",
    "pack",
]


@click.command()
@click.option("--config", "config_path", type=str, default=None, help="YAML config")
@click.option("--processing_step", type=click.Choice(STEPS), required=True)
@click.option("--source", type=str, required=True, help="Input directory")
@click.option("--dest", type=str, required=True, help="Output directory")
@click.option("--dataset", "dataset_name", type=str, default="claro")
@click.option("--resolution", type=int, default=256)
@click.option("--hu-min", type=float, default=-1000.0)
@click.option("--hu-max", type=float, default=1000.0)
@click.option("--zoom", type=float, default=2.0, help="Respacing factor for resize step")
@click.option("--pop-range", type=int, default=10, help="Slices dropped at stack ends")
@click.option("--max-patients", type=int, default=100000)
@click.option("--train-split", type=float, default=0.7)
@click.option("--val-split", type=float, default=0.1)
@click.option("--test-split", type=float, default=0.2)
@click.option("--seed", type=int, default=42)
def main(config_path, processing_step, source, dest, dataset_name, resolution,
         hu_min, hu_max, zoom, pop_range, max_patients,
         train_split, val_split, test_split, seed):
    """Run one preprocessing stage."""
    from ..utils.config import Logger, allocate_run_dir, dump_options, load_yaml

    cfg = load_yaml(config_path) if config_path else {}
    run_dir = allocate_run_dir(os.path.join(dest, "runs"), processing_step)
    Logger(os.path.join(run_dir, "log.txt"))
    dump_options(run_dir, dict(
        step=processing_step, source=source, dest=dest, dataset=dataset_name,
        resolution=resolution, hu=[hu_min, hu_max], zoom=zoom, config=dict(cfg),
    ), name="preprocessing_options.json")
    np.random.seed(seed)

    if processing_step == "process_tiff":
        step_process_tiff(source, dest, resolution, hu_min, hu_max)
    elif processing_step == "process_nifti_resized":
        step_resize(source, dest, zoom)
    elif processing_step == "process_nifti_normalized":
        step_normalize(source, dest, hu_min, hu_max)
    elif processing_step == "mask_nifti":
        # Pelvis_2.1 uses the nilearn EPI-mask recipe; other datasets the
        # generic threshold recipe (reference dataset_tool_mi.py:486-510).
        step_mask(source, dest,
                  method="epi" if dataset_name.startswith("Pelvis") else "threshold")
    elif processing_step == "snap_pickle":
        step_snap_pickle(source, dest, pop_range)
    elif processing_step == "snap_zip":
        step_snap_zip(source, dest, dataset_name, max_patients,
                      dict(train=train_split, val=val_split, test=test_split))
    elif processing_step == "pack":
        step_pack(source, dest, dataset_name)
    elif processing_step == "process_dicom_2_nifti":
        step_dicom_to_nifti(source, dest)
    print(f"{processing_step}: done -> {dest}")


def _load_volume(path: str):
    from ..data.preprocess.nifti import read_nifti

    return read_nifti(path)


def _save_volume(path: str, vol, zooms=(1, 1, 1)):
    from ..data.preprocess.nifti import write_nifti

    write_nifti(path, vol, zooms=zooms)


def step_dicom_to_nifti(source: str, dest: str) -> None:
    """DICOM series → NIfTI (reference ``dataset_tool_mi.py:226-255``).

    Uses ``dicom2nifti`` when installed; otherwise the native reader
    (``data/preprocess/dicom.py``, uncompressed little-endian series).
    """
    try:
        import dicom2nifti

        convert = lambda pdir, out: dicom2nifti.dicom_series_to_nifti(
            pdir, out, reorient_nifti=False)
    except ImportError:
        from ..data.preprocess.dicom import dicom_series_to_nifti as convert
    os.makedirs(dest, exist_ok=True)
    for patient in sorted(os.listdir(source)):
        pdir = os.path.join(source, patient)
        if not os.path.isdir(pdir):
            continue
        out = os.path.join(dest, f"{patient}.nii.gz")
        if os.path.exists(out):
            continue
        convert(pdir, out)


def step_resize(source: str, dest: str, zoom: float) -> None:
    from ..data.preprocess.medical import resample_volume
    from ..data.preprocess.nifti import read_nifti, write_nifti

    os.makedirs(dest, exist_ok=True)
    for path in sorted(glob.glob(os.path.join(source, "**", "*.nii*"), recursive=True)):
        rel = os.path.relpath(path, source)
        out = os.path.join(dest, rel)
        if os.path.exists(out):
            continue
        os.makedirs(os.path.dirname(out), exist_ok=True)
        vol, zooms = read_nifti(path)
        resized, new_zooms = resample_volume(vol, zooms, zoom_level=zoom)
        write_nifti(out, resized, zooms=new_zooms)
        print(f"resized {rel}: {vol.shape} -> {resized.shape}")


def step_normalize(source: str, dest: str, lo: float, hi: float) -> None:
    from ..data.preprocess.medical import clip_and_rescale_volume
    from ..data.preprocess.nifti import read_nifti, write_nifti

    os.makedirs(dest, exist_ok=True)
    for path in sorted(glob.glob(os.path.join(source, "**", "*.nii*"), recursive=True)):
        rel = os.path.relpath(path, source)
        out = os.path.join(dest, rel)
        if os.path.exists(out):
            continue
        os.makedirs(os.path.dirname(out), exist_ok=True)
        vol, zooms = read_nifti(path)
        write_nifti(out, clip_and_rescale_volume(vol, lo, hi), zooms=zooms)
        print(f"normalized {rel}")


def step_mask(source: str, dest: str, method: str = "epi") -> None:
    """``method="epi"``: the exact nilearn ``compute_epi_mask`` + per-slice
    fill-holes recipe the reference applies to Pelvis_2.1
    (``dataset_tool_mi.py:486-510``); ``"threshold"``: the generic
    threshold/largest-CC recipe (``:431-464``)."""
    from ..data.preprocess.medical import body_mask_volume, epi_body_mask_volume
    from ..data.preprocess.nifti import read_nifti, write_nifti

    mask_fn = epi_body_mask_volume if method == "epi" else body_mask_volume
    os.makedirs(dest, exist_ok=True)
    for path in sorted(glob.glob(os.path.join(source, "**", "*.nii*"), recursive=True)):
        rel = os.path.relpath(path, source)
        out = os.path.join(dest, rel)
        if os.path.exists(out):
            continue
        os.makedirs(os.path.dirname(out), exist_ok=True)
        vol, zooms = read_nifti(path)
        write_nifti(out, mask_fn(vol).astype(np.float32), zooms=zooms)
        print(f"masked {rel}")


def step_process_tiff(source: str, dest: str, resolution: int,
                      hu_min: float, hu_max: float) -> None:
    """claro path: per-slice TIFF/PNG → box-crop → resize → clip →
    normalise → per-patient pickles (reference ``:882-1001``)."""
    from PIL import Image

    from ..data.preprocess.medical import load_slice

    os.makedirs(dest, exist_ok=True)
    import pickle as pkl

    for patient in sorted(os.listdir(source)):
        pdir = os.path.join(source, patient)
        if not os.path.isdir(pdir):
            continue
        out_pdir = os.path.join(dest, patient)
        os.makedirs(out_pdir, exist_ok=True)
        files = sorted(
            f for f in os.listdir(pdir)
            if f.lower().endswith((".tif", ".tiff", ".png"))
        )
        for i, fn in enumerate(files):
            img = np.asarray(Image.open(os.path.join(pdir, fn))).astype(np.float64)
            sl = load_slice(
                img, img_dim=resolution, box=None,
                clip={"min": hu_min, "max": hu_max},
                scale={"min": hu_min, "max": hu_max},
                convert_to_uint8=False, scale_by_255=True,
            )
            out = os.path.join(out_pdir, f"{patient}_{i:05d}.pickle")
            with open(out, "wb") as f:
                pkl.dump({"CT": sl.astype(np.float32)}, f)
        print(f"processed {patient}: {len(files)} slices")


def step_snap_pickle(source: str, dest: str, pop_range: int) -> None:
    from ..data.preprocess.nifti import read_nifti
    from ..data.preprocess.packaging import write_slice_pickles

    os.makedirs(dest, exist_ok=True)
    patients = {}
    for path in sorted(glob.glob(os.path.join(source, "*", "*.nii*"))):
        mode = os.path.basename(os.path.dirname(path))
        patient = os.path.basename(path).split(".")[0]
        patients.setdefault(patient, {})[mode] = path
    for patient, modes in patients.items():
        slices = {m: read_nifti(p)[0] for m, p in modes.items()}
        write_slice_pickles(dest, patient, slices, pop_range=pop_range)
        print(f"sliced {patient}: modes={list(modes)}")


def step_snap_zip(source: str, dest: str, dataset_name: str, max_patients: int,
                  fractions: dict) -> None:
    from ..data.preprocess.packaging import load_or_create_split, write_zip

    patients = [p for p in sorted(os.listdir(source))
                if os.path.isdir(os.path.join(source, p))]
    n = min(max_patients, len(patients))
    basename = (
        f"{dataset_name}-num-{n:d}_val-hold_out_exps-1_fold-0_"
        f"train-{fractions['train']:0.2f}_val-{fractions['val']:0.2f}_test-{fractions['test']:0.2f}"
    )
    split = load_or_create_split(
        os.path.join(dest, "train_val_test_ids", f"{basename}.json"),
        patients, max_patients=max_patients, fractions=fractions,
    )
    out = write_zip(source, os.path.join(dest, f"{basename}.zip"), split)
    print(f"wrote {out}: train={len(split['train'])} val={len(split['val'])} test={len(split['test'])}")


def step_pack(source: str, dest: str, dataset_name: str) -> None:
    """Convert a reference-format pickle zip (or pickle tree) into the
    TPU-native sharded memmap format."""
    from ..data.dataset import ZipSliceDataset
    from ..data.preprocess.packaging import pack_shards

    for split in ("train", "val", "test"):
        try:
            ds = ZipSliceDataset(source, split=split) if source.endswith(".zip") else None
        except IOError:
            continue
        if ds is None:
            continue
        images, names = [], []
        for i in range(len(ds)):
            img, _label, fname = ds[i]
            images.append(img)
            names.append(fname)
        pack_shards(dest, split, images, names, dataset_name=dataset_name)
        print(f"packed {split}: {len(images)} items")


if __name__ == "__main__":
    main()
