"""Colorization / template (regression) i2i model variants.

Reference: ``pytorch-CycleGAN-and-pix2pix/models/colorization_model.py``
(pix2pix L->ab in CIELAB + Lab->RGB visuals) and ``template_model.py``
(G-only L1 regression).  The CIELAB conversion is pinned against the
standard published sRGB/D65 values (skimage is not installed here; the
constants are identical to its ``xyz_from_rgb``/D65 tables).
"""

import numpy as np
import pytest

import jax

from gantrack_tpu.utils.colorspace import lab2rgb, rgb2lab


# Published CIELAB (D65, sRGB) coordinates of the sRGB primaries.
_KNOWN = [
    ((255, 255, 255), (100.0, 0.0, 0.0)),
    ((0, 0, 0), (0.0, 0.0, 0.0)),
    ((255, 0, 0), (53.2408, 80.0925, 67.2032)),
    ((0, 255, 0), (87.7347, -86.1827, 83.1793)),
    ((0, 0, 255), (32.2970, 79.1875, -107.8602)),
    ((128, 128, 128), (53.5850, 0.0, 0.0)),
]


@pytest.mark.parametrize("rgb,lab", _KNOWN)
def test_rgb2lab_known_values(rgb, lab):
    got = rgb2lab(np.array(rgb, np.uint8).reshape(1, 1, 3))[0, 0]
    np.testing.assert_allclose(got, lab, atol=5e-3)


def test_lab_roundtrip():
    rng = np.random.default_rng(0)
    rgb = rng.random((16, 16, 3))
    back = lab2rgb(rgb2lab(rgb))
    np.testing.assert_allclose(back, rgb, atol=1e-6)


def test_colorization_trainer_step_and_visuals():
    from gantrack_tpu.training.image2image import (
        ColorizationTrainer, Pix2PixConfig,
    )

    cfg = Pix2PixConfig(ngf=8, ndf=8, netG="resnet_6blocks", no_dropout=True)
    tr = ColorizationTrainer(cfg, image_size=32, iters_per_epoch=10)
    # The colorization dataset mode forces 1->2 channels regardless of cfg
    # (reference modify_commandline_options -> colorization dataset).
    assert tr.cfg.input_nc == 1 and tr.cfg.output_nc == 2

    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    real_a = rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32)
    real_b = rng.uniform(-1, 1, (2, 32, 32, 2)).astype(np.float32) * 0.5
    state, losses = tr.optimize_parameters(state, real_a, real_b)
    assert np.isfinite(losses["G"]) and np.isfinite(losses["D"])
    assert int(state.step) == 1

    vis = tr.compute_visuals(real_a, real_b, real_b * 0.9)
    assert vis["real_B_rgb"].shape == (2, 32, 32, 3)
    assert vis["fake_B_rgb"].shape == (2, 32, 32, 3)
    # reference lab2rgb contract: RGB in [0, 255]
    assert vis["real_B_rgb"].min() >= 0.0 and vis["real_B_rgb"].max() <= 255.0
    # Gray input (L=0 plane, ab=0) must map to a (near-)neutral gray RGB
    # (the published XYZ<->RGB matrices are rounded to 6 decimals, so the
    # channels agree to ~1e-3 of 255 — identical behavior to skimage).
    gray = tr.lab2rgb(np.zeros((1, 1, 1, 1)), np.zeros((1, 1, 1, 2)))
    np.testing.assert_allclose(gray[..., 0], gray[..., 1], atol=1e-2)
    np.testing.assert_allclose(gray[..., 1], gray[..., 2], atol=1e-2)


def test_regression_trainer_converges():
    """template_model: min_G ||G(A)-B||_1 — loss must fall on a fixed batch."""
    from gantrack_tpu.training.image2image import (
        RegressionConfig, RegressionTrainer,
    )

    cfg = RegressionConfig(input_nc=1, output_nc=1, ngf=8,
                           netG="resnet_6blocks", lambda_regression=1.0,
                           lr=2e-3)
    tr = RegressionTrainer(cfg, image_size=16, iters_per_epoch=100)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    a = rng.uniform(-1, 1, (2, 16, 16, 1)).astype(np.float32)
    b = np.tanh(a * 0.5).astype(np.float32)
    losses = []
    for _ in range(12):
        state, l = tr.optimize_parameters(state, a, b)
        losses.append(l["loss_G"])
    assert losses[-1] < losses[0] * 0.8, losses
    assert int(state.step) == 12
