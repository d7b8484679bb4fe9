"""Latent projection: optimisation reduces the objective and recovers a
target rendered by the generator itself; noise-buffer regularisation and
renormalisation match the reference projector's math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantrack_tpu.models.stylegan2 import Generator
from gantrack_tpu.tools.projector import (
    ProjectorConfig, _noise_reg, _renorm_noise, compute_w_stats, project,
    projection_loop,
)


def _tiny_g():
    g = Generator(
        z_dim=8, c_dim=0, w_dim=8, img_resolution=16, img_channels=1,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=128, channel_max=32, num_fp16_res=0),
    )
    z = jnp.zeros((1, 8))
    variables = g.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, z, None)
    return g, variables


def test_w_stats():
    g, v = _tiny_g()
    w_avg, w_std = compute_w_stats(g, v, z_dim=8, num_samples=256)
    assert w_avg.shape == (1, 1, 8)
    assert w_std > 0


def test_projection_recovers_generated_target():
    g, v = _tiny_g()
    # Target = G(w*) for a known w; projection should approach it.
    z_t = jax.random.normal(jax.random.PRNGKey(5), (1, 8))
    ws_t = g.apply(v, z_t, None, method=lambda m, z, c: m.mapping(z, c))
    target = g.apply(v, ws_t, noise_mode="const",
                     method=lambda m, ws, **kw: m.synthesis(ws, **kw))[0]

    cfg = ProjectorConfig(num_steps=60, w_avg_samples=256,
                          initial_learning_rate=0.05, w_pix_weight=1.0,
                          optimize_noise=False)
    result = project(g, v, np.asarray(target), feature_fn=None, cfg=cfg)
    assert result["w"].shape[1] == 8
    losses = result["losses"]
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    # reconstruction error of the final w
    ws_fit = jnp.asarray(result["w"])[None]
    recon = g.apply(v, ws_fit, noise_mode="const",
                    method=lambda m, ws, **kw: m.synthesis(ws, **kw))[0]
    err = float(jnp.mean(jnp.square(recon - target)))
    base = float(jnp.mean(jnp.square(target)))
    assert err < base, (err, base)


def test_noise_reg_matches_reference():
    """Pyramid shift-correlation reg vs the reference loop
    (``projector.py:260-268``) run in torch."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    for size in (8, 16, 64):
        buf = rng.standard_normal((size, size)).astype(np.float32)
        n = torch.from_numpy(buf)[None, None]
        ref = 0.0
        while True:
            ref += (n * torch.roll(n, shifts=1, dims=3)).mean() ** 2
            ref += (n * torch.roll(n, shifts=1, dims=2)).mean() ** 2
            if n.shape[2] <= 8:
                break
            n = F.avg_pool2d(n, kernel_size=2)
        got = float(_noise_reg(jnp.asarray(buf)))
        np.testing.assert_allclose(got, float(ref), rtol=1e-5)


def test_renorm_noise():
    buf = jnp.asarray(np.random.default_rng(1).standard_normal((16, 16)) * 3 + 2,
                      jnp.float32)
    out = _renorm_noise(buf)
    assert abs(float(jnp.mean(out))) < 1e-5
    np.testing.assert_allclose(float(jnp.mean(jnp.square(out))), 1.0, rtol=1e-4)


def test_noise_optimization_improves_and_is_normalized():
    g, v = _tiny_g()
    z_t = jax.random.normal(jax.random.PRNGKey(7), (1, 8))
    ws_t = g.apply(v, z_t, None, method=lambda m, z, c: m.mapping(z, c))
    target = g.apply(v, ws_t, noise_mode="const",
                     method=lambda m, ws, **kw: m.synthesis(ws, **kw))[0]
    cfg = ProjectorConfig(num_steps=30, w_avg_samples=128,
                          initial_learning_rate=0.05, w_pix_weight=1.0,
                          optimize_noise=True)
    result = project(g, v, np.asarray(target), cfg=cfg)
    assert result["noise"] is not None
    for buf in jax.tree.leaves(result["noise"]):
        assert abs(float(np.mean(buf))) < 1e-4
        np.testing.assert_allclose(float(np.mean(np.square(buf))), 1.0, rtol=1e-3)
    assert result["losses"][-1] < result["losses"][0]
    assert 0 <= result["best_step"] < cfg.num_steps
    assert result["reg_losses"][0] >= 0


def test_early_stopping_truncates():
    g, v = _tiny_g()
    target = np.zeros((16, 16, 1), np.float32)
    cfg = ProjectorConfig(num_steps=50, w_avg_samples=64,
                          initial_learning_rate=0.0,  # loss can't improve
                          early_stopping=5, optimize_noise=False)
    result = project(g, v, target, cfg=cfg)
    assert len(result["losses"]) < 50


class _StubDataset:
    """(image, label, fname) triples with patient/slice naming."""

    num_channels = 1

    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        img, fname = self.items[i]
        return img, np.zeros((0,), np.float32), fname


def test_projection_loop_artifacts(tmp_path):
    g, v = _tiny_g()
    img = np.clip(np.asarray(
        g.apply(v, jax.random.normal(jax.random.PRNGKey(3), (1, 8)), None,
                noise_mode="const")[0]), -1, 1).astype(np.float32)
    # Real GANDataset implementations return raw 0..255 pixels (loader
    # normalizes separately) — feed that convention so the loop's own
    # normalization is exercised, not a pre-normalized stub.
    img255 = ((img + 1) * 127.5).astype(np.float32)
    ds = _StubDataset([
        (img255, "pA_00001.tif"), (img255, "pA_00002.tif"),
        (img255, "pB_00001.tif"),
    ])
    cfg = ProjectorConfig(num_steps=4, w_avg_samples=64, optimize_noise=False)
    out = projection_loop(
        g, v, ds, str(tmp_path), cfg=cfg, verbose=False, first_slice_steps=4)
    assert set(out.keys()) == {"pA", "pB"}
    assert set(out["pA"].keys()) == {1, 2}
    assert (tmp_path / "projected_w").exists()
    assert (tmp_path / "pA" / "projections" ).is_dir()
    npzs = list((tmp_path / "pA" / "projections").glob("w_00001-*.npz"))
    assert npzs, "per-slice w npz missing"
    w = np.load(npzs[0])["w"]
    assert w.shape[1:] == (g.num_ws if hasattr(g, "num_ws") else 4, 8) or w.ndim == 3
    pngs = list((tmp_path / "pA" / "M0" / "image_log").glob("*.png"))
    assert pngs
    assert list((tmp_path / "pA" / "loss").glob("opt_loss_*.csv"))
    # Regression: 0..255 inputs must be normalized before projection — the
    # written target half (left) of the pair must match the source pixels,
    # not a saturated all-white plane.
    import PIL.Image
    pair = np.asarray(PIL.Image.open(pngs[0]))
    target_half = pair[:, : pair.shape[1] // 2]
    np.testing.assert_allclose(target_half.astype(np.float32),
                               np.round(img255[..., 0]), atol=1.0)
    assert target_half.mean() < 250, "target half saturated: 0..255 input not normalized"


def test_lpips_features_distance_properties():
    from gantrack_tpu.models.vgg import VGG16, lpips_features, random_params

    model = VGG16(resize_to=64)
    params = random_params(jax.random.PRNGKey(0), resize_to=64)
    a = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (1, 32, 32, 3)),
                    jnp.float32)
    fa = lpips_features(model, params, a)
    fb = lpips_features(model, params, a * 0.5)
    assert fa.ndim == 2
    assert float(jnp.sum(jnp.square(fa - fa))) == 0.0
    assert float(jnp.sum(jnp.square(fa - fb))) > 0.0
