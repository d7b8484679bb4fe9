"""StyleGAN3 generator and CycleGAN/pix2pix family smoke + shape tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_stylegan3_forward_shapes():
    from gantrack_tpu.models.stylegan3 import Generator

    g = Generator(
        z_dim=16, c_dim=0, w_dim=16, img_resolution=32, img_channels=1,
        channel_base=1024, channel_max=32, num_fp16_res=0,
        synthesis_kwargs=dict(num_layers=6, num_critical=2),
    )
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    variables = g.init({"params": jax.random.PRNGKey(0)}, z, None)
    img = g.apply(variables, z, None)
    assert img.shape == (2, 32, 32, 1)
    assert img.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(img)))


def test_stylegan3_magnitude_ema_updates():
    from gantrack_tpu.models.stylegan3 import Generator

    g = Generator(
        z_dim=16, c_dim=0, w_dim=16, img_resolution=32, img_channels=1,
        channel_base=1024, channel_max=32, num_fp16_res=0,
        synthesis_kwargs=dict(num_layers=6, num_critical=2),
    )
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    variables = g.init({"params": jax.random.PRNGKey(0)}, z, None)
    emas0 = jax.tree.leaves(variables["emas"])
    _, mutated = g.apply(variables, z, None, update_emas=True, mutable=["emas"])
    emas1 = jax.tree.leaves(mutated["emas"])
    changed = [not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(emas0, emas1)]
    assert any(changed)


def test_stylegan3_radial_config():
    from gantrack_tpu.models.stylegan3 import Generator

    g = Generator(
        z_dim=8, c_dim=0, w_dim=8, img_resolution=32, img_channels=1,
        channel_base=1024, channel_max=32, num_fp16_res=0,
        conv_kernel=1, use_radial_filters=True,
        synthesis_kwargs=dict(num_layers=6, num_critical=2),
    )
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 8))
    variables = g.init({"params": jax.random.PRNGKey(0)}, z, None)
    img = g.apply(variables, z, None)
    assert img.shape == (1, 32, 32, 1)
    assert bool(jnp.all(jnp.isfinite(img)))


def test_cyclegan_step():
    from gantrack_tpu.training.image2image import CycleGANConfig, CycleGANTrainer

    cfg = CycleGANConfig(input_nc=1, output_nc=1, ngf=8, ndf=8, netG="resnet_6blocks")
    trainer = CycleGANTrainer(cfg, image_size=32, iters_per_epoch=10)
    state = trainer.init_state(jax.random.PRNGKey(0))
    a = np.random.default_rng(0).standard_normal((2, 32, 32, 1)).astype(np.float32)
    b = np.random.default_rng(1).standard_normal((2, 32, 32, 1)).astype(np.float32)
    state, losses = trainer.optimize_parameters(state, a, b)
    assert int(state.step) == 1
    assert all(np.isfinite(v) for v in losses.values())


def test_pix2pix_step():
    from gantrack_tpu.training.image2image import Pix2PixConfig, Pix2PixTrainer

    cfg = Pix2PixConfig(input_nc=1, output_nc=1, ngf=8, ndf=8, netG="unet_128")
    trainer = Pix2PixTrainer(cfg, image_size=128, iters_per_epoch=10)
    state = trainer.init_state(jax.random.PRNGKey(0))
    a = np.random.default_rng(0).standard_normal((1, 128, 128, 1)).astype(np.float32)
    b = np.random.default_rng(1).standard_normal((1, 128, 128, 1)).astype(np.float32)
    state, losses = trainer.optimize_parameters(state, a, b)
    assert int(state.step) == 1
    assert all(np.isfinite(v) for v in losses.values())


def test_image_pool():
    from gantrack_tpu.training.image2image import ImagePool

    pool = ImagePool(4, seed=0)
    for i in range(10):
        out = pool.query(np.full((2, 4, 4, 1), float(i), np.float32))
        assert out.shape == (2, 4, 4, 1)
    assert len(pool.images) == 4


def test_lr_schedules():
    from gantrack_tpu.training.image2image import make_lr_schedule

    lin = make_lr_schedule("linear", 2e-4, 100, 100, 10)
    assert float(lin(0)) == pytest.approx(2e-4)
    assert float(lin(100 * 10)) < 2e-4
    assert float(lin(199 * 10)) == pytest.approx(2e-4 / 101, rel=1e-3)
    cos = make_lr_schedule("cosine", 2e-4, 100, 100, 10)
    assert float(cos(0)) == pytest.approx(2e-4)
