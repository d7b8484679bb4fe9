"""prepare_dataset CLI: patient/box intersection + per-slice export
(reference src/data/dataset_preparation.py)."""

import os

import numpy as np
import pytest
from click.testing import CliRunner
from PIL import Image

from gantrack_tpu.data.preprocess.medical import load_slice
from gantrack_tpu.tools.prepare_dataset import main

BOX = [4, 4, 28, 28]


@pytest.fixture
def raw_tree(tmp_path):
    rng = np.random.default_rng(0)
    src = tmp_path / "raw"
    rows, boxes = [], []
    for p in ("p0", "p1"):
        for s in range(2):
            sid = f"{p}_{s:03d}"
            d = src / p / "images"
            d.mkdir(parents=True, exist_ok=True)
            img = rng.uniform(-1200, 1200, (32, 32)).astype(np.float32)
            Image.fromarray(img).save(d / f"{sid}.tif", "tiff")
            rows.append(f"images/{sid}.tif")
            if sid != "p1_001":  # one un-annotated slice drops out
                boxes.append((sid, str(BOX)))
    info = tmp_path / "patients_info.csv"
    info.write_text("image\n" + "\n".join(rows) + "\n")
    boxf = tmp_path / "boxes.csv"
    boxf.write_text('"img ID","box lung"\n' + "\n".join(
        f'"{sid}","{b}"' for sid, b in boxes) + "\n")
    return src, info, boxf


def test_prepare_dataset_exports_intersection(raw_tree, tmp_path):
    src, info, boxf = raw_tree
    dest = tmp_path / "interim"
    res = CliRunner().invoke(main, [
        "--source", str(src), "--dest", str(dest),
        "--patients-info", str(info), "--box-file", str(boxf),
        "--resolution", "16",
    ], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    out = sorted(os.listdir(dest / "images"))
    assert out == ["p0_000.tif", "p0_001.tif", "p1_000.tif"]  # p1_001 dropped

    # Pixel parity with the claro per-slice pipeline on one sample.
    raw = np.asarray(Image.open(src / "p0" / "images" / "p0_000.tif"))
    want = load_slice(raw.astype(np.float64), img_dim=16, box=BOX,
                      clip={"min": -1000, "max": 1000},
                      scale={"min": -1000, "max": 1000},
                      convert_to_uint8=False, scale_by_255=True)
    got = np.asarray(Image.open(dest / "images" / "p0_000.tif"))
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6)
    # Run dir carries the resolved config (reference :1031-1047).
    runs = list((dest / "runs").iterdir())
    assert any((r / "configuration.json").exists() for r in runs)


def test_prepare_dataset_xlsx_needs_openpyxl(raw_tree, tmp_path):
    src, info, _ = raw_tree
    fake = tmp_path / "patients_info.xlsx"
    fake.write_bytes(b"not a real sheet")
    res = CliRunner().invoke(main, [
        "--source", str(src), "--dest", str(tmp_path / "x"),
        "--patients-info", str(fake),
    ])
    assert res.exit_code != 0
