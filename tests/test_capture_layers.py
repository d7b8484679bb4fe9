"""capture_layers CLI: the headless replacement for the reference GUI's
layer viewer (``viz/layer_widget.py``) — layer table, regex-selected
activation dumps, channel-grid PNGs."""

import os

import numpy as np

import jax
import jax.numpy as jnp


def _make_checkpoint(tmp_path, cfg="stylegan2"):
    from gantrack_tpu.tools.train import build_generator_from_cfg
    from gantrack_tpu.utils.checkpoint import save_checkpoint

    g = build_generator_from_cfg(
        cfg, resolution=32, channels=1, c_dim=0, cbase=256, cmax=64,
        map_depth=2, fp32=True, z_dim=16, w_dim=16,
    )
    z = jnp.zeros((2, 16), jnp.float32)
    g_vars = g.init({"params": jax.random.PRNGKey(0),
                     "noise": jax.random.PRNGKey(1)}, z, None)
    state = {
        "params_g_ema": g_vars["params"],
        "emas_g": g_vars.get("emas", {}),
        "consts_g": {k: v for k, v in g_vars.items()
                     if k not in ("params", "emas")},
    }
    ckpt_dir = str(tmp_path / "checkpoints")
    save_checkpoint(ckpt_dir, state, step=0)
    return str(tmp_path)  # run dir (the CLI appends checkpoints/)


def test_capture_layers_lists_and_dumps(tmp_path):
    from click.testing import CliRunner

    from gantrack_tpu.tools.capture_layers import main

    ckpt_dir = _make_checkpoint(tmp_path)
    common = ["--network", ckpt_dir, "--resolution", "32", "--channels", "1",
              "--cbase", "256", "--cmax", "64", "--map-depth", "2",
              "--z-dim", "16", "--w-dim", "16"]

    # Listing mode: a layer table with shapes (like the GUI's left panel).
    r = CliRunner().invoke(main, common + ["--seeds", "0"],
                           catch_exceptions=False)
    assert r.exit_code == 0, r.output
    assert "layer" in r.output and "32x32" in r.output, r.output

    # Dump mode: regex-matched layers → .npy (+ grid PNGs) per seed.
    outdir = str(tmp_path / "acts")
    r = CliRunner().invoke(main, common + [
        "--seeds", "0-1", "--layer", "synthesis", "--outdir", outdir,
        "--save-pngs",
    ], catch_exceptions=False)
    assert r.exit_code == 0, r.output
    for seed in (0, 1):
        seed_dir = os.path.join(outdir, f"seed{seed:04d}")
        npys = [f for f in os.listdir(seed_dir) if f.endswith(".npy")]
        pngs = [f for f in os.listdir(seed_dir) if f.endswith(".png")]
        assert npys and pngs
        arr = np.load(os.path.join(seed_dir, npys[0]))
        assert arr.ndim == 3 and np.isfinite(arr).all()


def test_channel_grid_normalisation():
    from gantrack_tpu.tools.capture_layers import channel_grid

    x = np.zeros((4, 4, 3), np.float32)
    x[..., 0] = 1.0    # constant positive channel → white
    x[..., 1] = -1.0   # constant negative → black
    grid = channel_grid(x)
    assert grid.shape == (8, 8)  # 3 channels → 2x2 grid of 4x4 tiles
    assert grid[:4, :4].min() >= 254
    assert grid[:4, 4:8].max() <= 1
