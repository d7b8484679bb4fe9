"""Functional tests for the small analysis/orchestration CLIs:
analysis (trend/best/loop/clean, reference analyze_gan.py +
create_bashloop.py + run_recursively_clean.py), generate_jobs (sbatch
template substitution), analyze_dataset (volume stats + pooled
percentiles), create_label_files."""

import json
import os

import numpy as np

from gantrack_tpu.tools.analysis import (
    best_snapshot, clean_run_dir, emit_metric_loop, metric_trend,
)
from gantrack_tpu.tools.analyze_dataset import percentile_search, volume_stats
from gantrack_tpu.tools.create_label_files import (
    build_label_file, load_patient_classes,
)
from gantrack_tpu.tools.generate_jobs import expand_sweep, substitute


def _run_dir(tmp_path):
    run = tmp_path / "00000-run"
    ck = run / "checkpoints"
    for s in (100, 200, 300):
        (ck / f"state-{s:08d}").mkdir(parents=True)
    recs = [
        {"results": {"fid10k": v},
         "snapshot_path": str(ck / f"state-{s:08d}")}
        for s, v in ((100, 50.0), (200, 30.0), (300, 41.0))
    ]
    (run / "metric-fid10k.jsonl").write_text(
        "\n".join(json.dumps(r) for r in recs) + "\n")
    return run


def test_metric_trend_and_best(tmp_path):
    run = _run_dir(tmp_path)
    trend = metric_trend(str(run), "fid10k")
    assert [v for _, v in trend] == [50.0, 30.0, 41.0]
    snap, val = best_snapshot(str(run), "fid10k")
    assert val == 30.0 and snap.endswith("state-00000200")
    assert best_snapshot(str(run), "nope") is None


def test_clean_run_dir_keeps_best_and_latest(tmp_path):
    run = _run_dir(tmp_path)
    removed = clean_run_dir(str(run), dry_run=True, metric="fid10k")
    names = [os.path.basename(p) for p in removed]
    assert names == ["state-00000100"]           # best(200) + latest(300) kept
    assert all(os.path.isdir(p) for p in removed)  # dry run deletes nothing
    clean_run_dir(str(run), dry_run=False, metric="fid10k")
    left = sorted(os.listdir(run / "checkpoints"))
    assert left == ["state-00000200", "state-00000300"]


def test_emit_metric_loop(tmp_path):
    run = _run_dir(tmp_path)
    script = emit_metric_loop(str(run), data="/d/set.zip", metrics="fid10k")
    body = open(script).read()
    assert body.count("calc_metrics") == 3
    assert "--network=" + str(run / "checkpoints" / "state-00000100") in body
    assert os.access(script, os.X_OK)


def test_generate_jobs_substitution():
    tpl = "#SBATCH -J <name>\npython train.py --gamma=<gamma> --data=<data>"
    out = substitute(tpl, {"name": "j1", "gamma": "0.4", "data": "/x"})
    assert "<" not in out and "--gamma=0.4" in out
    combos = expand_sweep({"gamma": [0.1, 0.2], "cbase": [16384]})
    assert len(combos) == 2
    assert {c["gamma"] for c in combos} == {0.1, 0.2}
    assert all(c["cbase"] == 16384 for c in combos)
    # substitute() stringifies raw sweep values
    assert "--gamma=0.1" in substitute("--gamma=<gamma>", combos[0])


def test_analyze_dataset_roundtrip(tmp_path):
    from gantrack_tpu.data.preprocess.nifti import write_nifti

    rng = np.random.default_rng(0)
    paths = []
    for i in range(2):
        vol = rng.normal(100 * i, 10, (8, 8, 6)).astype(np.float32)
        p = tmp_path / f"v{i}.nii"
        write_nifti(str(p), vol, zooms=(1.0, 1.0, 2.5))
        paths.append(str(p))
    st = volume_stats(paths[0])
    assert st["shape"] == "8x8x6" and st["spacing"].endswith("2.500")
    assert st["min"] <= st["p01"] < st["p99"] <= st["max"]
    pct = percentile_search(paths, 1.0, 99.0)
    assert pct["n_volumes"] == 2
    assert -40 < pct["lower"] < 0 < 100 < pct["upper"] < 140


def test_create_label_files(tmp_path):
    pd_dir = tmp_path / "patients"
    for p, n in (("pA", 2), ("pB", 1), ("pC", 1)):
        d = pd_dir / p
        d.mkdir(parents=True)
        for i in range(n):
            (d / f"{p}_{i:05d}.pickle").write_bytes(b"x")
    table = tmp_path / "classes.csv"
    table.write_text("id,label\npA,malignant\npB,benign\npC,malignant\n")
    classes = load_patient_classes(str(table))
    assert classes == {"pA": 1, "pB": 0, "pC": 1}  # sorted class order
    out = tmp_path / "train" / "dataset.json"
    n = build_label_file(str(pd_dir), classes, ["pA", "pC"], str(out))
    assert n == 3
    labels = json.load(open(out))["labels"]
    assert ["pA/pA_00000.pickle", 1] in labels
    assert all(not row[0].startswith("pB") for row in labels)
