"""Label-file generation (reference ``src/data/create_files.py:15-47``).

Builds per-split ``dataset.json`` files ``{"labels": [[path, int], ...]}``
from a patient→class mapping (CSV/XLSX/JSON), so conditional training can
read class labels through the dataset's label plumbing.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import click


def build_label_file(
    patients_dir: str,
    patient_classes: Dict[str, int],
    split_patients,
    out_path: str,
) -> int:
    labels = []
    for patient in split_patients:
        pdir = os.path.join(patients_dir, patient)
        if not os.path.isdir(pdir) or patient not in patient_classes:
            continue
        for fn in sorted(os.listdir(pdir)):
            if fn.endswith(".pickle"):
                labels.append([f"{patient}/{fn}", int(patient_classes[patient])])
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump({"labels": labels}, f)
    return len(labels)


def load_patient_classes(path: str, id_col: str = "id", label_col: str = "label",
                         classes=None) -> Dict[str, int]:
    """CSV/XLSX/JSON patient→class table (reference reads xlsx bootstrap
    folds)."""
    if path.endswith(".json"):
        with open(path) as f:
            raw = json.load(f)
        mapping = raw
    else:
        import pandas as pd

        df = pd.read_excel(path) if path.endswith((".xlsx", ".xls")) else pd.read_csv(path)
        mapping = dict(zip(df[id_col].astype(str), df[label_col]))
    if classes is not None:
        cls_idx = {c: i for i, c in enumerate(classes)}
        return {k: cls_idx[v] if v in cls_idx else int(v) for k, v in mapping.items()}
    vals = sorted(set(mapping.values()), key=str)
    cls_idx = {c: i for i, c in enumerate(vals)}
    return {k: cls_idx[v] for k, v in mapping.items()}


@click.command()
@click.option("--patients-dir", required=True, help="temp dir of per-patient pickles")
@click.option("--labels", "labels_path", required=True, help="CSV/XLSX/JSON patient->class")
@click.option("--split-file", required=True, help="train/val/test split json")
@click.option("--out-dir", required=True)
@click.option("--classes", default=None, help="comma-separated class names (order = index)")
def main(patients_dir, labels_path, split_file, out_dir, classes):
    """Write per-split dataset.json label files."""
    with open(split_file) as f:
        split = json.load(f)
    class_list = classes.split(",") if classes else None
    patient_classes = load_patient_classes(labels_path, classes=class_list)
    for split_name in ("train", "val", "test"):
        n = build_label_file(
            patients_dir, patient_classes, split.get(split_name, []),
            os.path.join(out_dir, f"dataset_{split_name}.json"),
        )
        print(f"{split_name}: {n} labels")


if __name__ == "__main__":
    main()
