"""Stats dashboard: jsonl parsing + HTTP surface (reference visdom
live-plot equivalent, util/visualizer.py:plot_current_losses)."""

import json
import threading
import urllib.request

from gantrack_tpu.tools.stats_dashboard import read_series, serve


def _write_run(tmp_path):
    lines = []
    for i in range(4):
        lines.append(json.dumps({
            "Progress/kimg": i * 0.5, "Loss/G/loss": 1.0 - 0.1 * i,
            "Loss/D/loss": 1.2 + 0.05 * i, "Progress/augment": 0.01 * i,
            "Timing/sec_per_kimg": 300.0 - i,
        }))
    (tmp_path / "stats.jsonl").write_text("\n".join(lines) + "\ntorn{")
    (tmp_path / "metric-fid1k.jsonl").write_text(json.dumps({
        "results": {"fid1k": 44.0},
        "snapshot_path": "/x/checkpoints/state-00000125",
    }) + "\n")
    (tmp_path / "metric-pr10k3.jsonl").write_text(json.dumps({
        "results": {"pr10k3_precision": 0.6, "pr10k3_recall": 0.4},
        "snapshot_path": "/x/checkpoints/state-00000125",
    }) + "\n")
    return tmp_path


def test_read_series(tmp_path):
    run = _write_run(tmp_path)
    s = read_series(str(run))
    assert s["kimg"] == [0.0, 0.5, 1.0, 1.5]       # torn tail line skipped
    assert s["loss_g"][0] == 1.0 and s["loss_d"][3] == 1.35
    assert s["metrics"]["fid1k"][0]["value"] == 44.0
    assert s["metrics"]["fid1k"][0]["snapshot"] == "state-00000125"
    # multi-result metrics stay one series PER RESULT KEY, never interleaved
    assert s["metrics"]["pr10k3_precision"] == [
        {"value": 0.6, "snapshot": "state-00000125"}]
    assert s["metrics"]["pr10k3_recall"][0]["value"] == 0.4


def test_dashboard_http(tmp_path):
    run = _write_run(tmp_path)
    httpd = serve(str(run), "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        page = urllib.request.urlopen(f"http://127.0.0.1:{port}/").read()
        assert b"gantrack stats" in page and b"--series-1" in page
        data = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/series").read())
        assert data["run"] == run.name
        assert len(data["kimg"]) == 4
    finally:
        httpd.shutdown()


def test_read_series_empty_dir(tmp_path):
    s = read_series(str(tmp_path))
    assert s["kimg"] == [] and s["metrics"] == {} and s["extra"] == {}


def test_parse_i2i_loss_log(tmp_path):
    (tmp_path / "loss_log.txt").write_text(
        "(epoch 1, iters 100) G_GAN: 0.812 G_L1: 12.300 D_real: 0.650\n"
        "End of epoch 1 \t Time: 12 sec\n"
        "(epoch 2, iters 200) G_GAN: nan G_L1: 11.000 D_real: 0.600\n"
    )
    s = read_series(str(tmp_path))
    # nan (divergence) becomes a null gap — browsers reject NaN JSON
    assert s["extra"]["G_GAN"] == {"x": [100, 200], "y": [0.812, None]}
    assert s["extra"]["G_L1"]["y"] == [12.3, 11.0]
    assert set(s["extra"]) == {"G_GAN", "G_L1", "D_real"}
    json.dumps(s, allow_nan=False)  # payload is strictly JSON-safe
