"""gen_video CLI (latent-loop interpolation grid) and avg_spectra math
(reference gen_video.py / avg_spectra.py)."""

import os

import numpy as np
import pytest
from click.testing import CliRunner

from gantrack_tpu.tools.avg_spectra import azimuthal_average, compute_spectrum_batch

RES = 32


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    import jax

    from gantrack_tpu.models.stylegan2 import Discriminator
    from gantrack_tpu.tools.train import build_generator_from_cfg
    from gantrack_tpu.training import create_train_state, lazy_reg_adam
    from gantrack_tpu.utils.checkpoint import save_checkpoint

    g = build_generator_from_cfg("stylegan2", resolution=RES, channels=1,
                                 c_dim=0, cbase=256, cmax=64, fp32=True)
    d = Discriminator(c_dim=0, img_resolution=RES, img_channels=1,
                      channel_base=256, channel_max=64, num_fp16_res=0,
                      epilogue_kwargs=dict(mbstd_group_size=2))
    opt = lazy_reg_adam(0.002)
    state = create_train_state(g, d, jax.random.PRNGKey(0), opt, opt,
                               z_dim=g.z_dim, c_dim=0, img_resolution=RES,
                               img_channels=1)
    run = tmp_path_factory.mktemp("vrun")
    save_checkpoint(str(run / "checkpoints"), state)
    return str(run)


def test_gen_video_gif_and_frames(tiny_ckpt, tmp_path):
    from gantrack_tpu.tools.gen_video import main

    gif = tmp_path / "loop.gif"
    res = CliRunner().invoke(main, [
        "--network", tiny_ckpt, "--seeds", "0-3", "--grid", "2x2",
        "--w-frames", "2", "--output", str(gif),
        "--resolution", str(RES), "--channels", "1",
        "--cbase", "256", "--cmax", "64",
    ], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    assert gif.stat().st_size > 0 and gif.read_bytes()[:6] in (b"GIF87a", b"GIF89a")

    frames_dir = tmp_path / "frames"
    res = CliRunner().invoke(main, [
        "--network", tiny_ckpt, "--seeds", "0-3", "--grid", "2x2",
        "--w-frames", "2", "--output", str(frames_dir),
        "--resolution", str(RES), "--channels", "1",
        "--cbase", "256", "--cmax", "64",
    ], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    frames = sorted(os.listdir(frames_dir))
    assert len(frames) == 2 and frames[0] == "frame00000.png"
    from PIL import Image

    assert Image.open(frames_dir / frames[0]).size == (2 * RES, 2 * RES)


def test_spectrum_separates_smooth_from_noise():
    rng = np.random.default_rng(0)
    noise = rng.standard_normal((8, 64, 64))
    xs = np.linspace(0, 2 * np.pi, 64)
    smooth = np.stack([np.sin(xs)[None, :] * np.sin(xs)[:, None]] * 8) \
        + 0.01 * rng.standard_normal((8, 64, 64))
    s_noise = azimuthal_average(compute_spectrum_batch(noise))
    s_smooth = azimuthal_average(compute_spectrum_batch(smooth))
    assert s_noise.shape == s_smooth.shape == (32,)
    # white noise: flat tail; smooth image: energy concentrated at low f
    assert s_smooth[:4].sum() / s_smooth.sum() > 0.95
    assert s_noise[16:].mean() > 0.2 * s_noise[:4].mean()


def test_azimuthal_average_radial_impulse():
    spec = np.zeros((64, 64))
    spec[32, 32] = 7.0  # DC bin
    prof = azimuthal_average(spec)
    assert prof[0] > 0 and np.all(prof[1:] == 0)
