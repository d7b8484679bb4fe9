"""StyleGAN2 G/D parity: shapes, and full forward equality vs the reference
networks with transplanted weights (the strongest end-to-end numerics check)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantrack_tpu.models.stylegan2 import Discriminator, Generator, minibatch_stddev
from conftest import has_reference, import_reference_module

requires_reference = pytest.mark.skipif(not has_reference(), reason="reference tree not present")

CFG = dict(z_dim=16, c_dim=0, w_dim=16, img_resolution=32, img_channels=1)
SYN = dict(channel_base=256, channel_max=64, num_fp16_res=0)
MAP = dict(num_layers=2)


def _build_ours():
    return Generator(
        **CFG,
        mapping_kwargs=dict(MAP),
        synthesis_kwargs=dict(SYN),
    )


def test_generator_shapes_and_determinism():
    g = _build_ours()
    k = jax.random.PRNGKey(0)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, CFG["z_dim"]))
    variables = g.init({"params": k, "noise": jax.random.PRNGKey(2)}, z, None)
    img = g.apply(variables, z, None, rngs={"noise": jax.random.PRNGKey(3)})
    assert img.shape == (2, 32, 32, 1)
    assert img.dtype == jnp.float32
    # const noise mode is deterministic without rng
    img1 = g.apply(variables, z, None, noise_mode="const")
    img2 = g.apply(variables, z, None, noise_mode="const")
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))


def test_discriminator_shapes():
    d = Discriminator(c_dim=0, img_resolution=32, img_channels=1,
                      channel_base=256, channel_max=64, num_fp16_res=0)
    x = jnp.zeros((4, 32, 32, 1))
    variables = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(variables, x)
    assert out.shape == (4, 1)


def test_conditional_generator_and_discriminator():
    cfg = dict(CFG, c_dim=3)
    g = Generator(**cfg, mapping_kwargs=dict(MAP), synthesis_kwargs=dict(SYN))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg["z_dim"]))
    c = jax.nn.one_hot(jnp.array([0, 2]), 3)
    variables = g.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(2)}, z, c)
    img = g.apply(variables, z, c, noise_mode="const")
    assert img.shape == (2, 32, 32, 1)

    d = Discriminator(c_dim=3, img_resolution=32, img_channels=1,
                      channel_base=256, channel_max=64, num_fp16_res=0)
    dv = d.init(jax.random.PRNGKey(0), img, c)
    out = d.apply(dv, img, c)
    assert out.shape == (2, 1)


def test_w_avg_ema_updates():
    g = _build_ours()
    z = jax.random.normal(jax.random.PRNGKey(1), (8, CFG["z_dim"]))
    variables = g.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(2)}, z, None)
    w0 = np.asarray(variables["emas"]["mapping"]["w_avg"])
    _, updated = g.apply(
        variables, z, None, update_emas=True, noise_mode="const", mutable=["emas"]
    )
    w1 = np.asarray(updated["emas"]["mapping"]["w_avg"])
    assert not np.allclose(w0, w1)


def test_minibatch_stddev_matches_reference_formula():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 4, 4, 6)).astype(np.float32))
    y = minibatch_stddev(x, group_size=4, num_channels=1)
    assert y.shape == (8, 4, 4, 7)
    # Reference semantics (networks_stylegan2.py:656-663): reshape(G, n, ...)
    # makes STRIDED groups — sample s shares its stat with samples s % n
    # apart (n = N/G = 2 here) — and y.repeat(G, ...) tiles them back.
    block = np.asarray(y[..., -1])
    assert np.allclose(block[0], block[2]) and np.allclose(block[0], block[6])
    assert np.allclose(block[1], block[3])
    assert not np.allclose(block[0], block[1])


@requires_reference
def test_minibatch_stddev_parity_vs_reference_batch8_group4():
    """Batch > group_size parity vs the reference layer (multi-group case —
    the round-1 bug hid here because batch == group covered one group only)."""
    import torch

    networks = import_reference_module("training.networks_stylegan2")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((8, 6, 4, 4)).astype(np.float32)  # NCHW for torch
    layer = networks.MinibatchStdLayer(group_size=4, num_channels=2)
    with torch.no_grad():
        ref = layer(torch.from_numpy(x)).numpy()
    ours = minibatch_stddev(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), group_size=4, num_channels=2
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, rtol=1e-5, atol=1e-5
    )


@requires_reference
def test_generator_matches_reference_with_transplanted_weights():
    torch = pytest.importorskip("torch")
    nets = import_reference_module("training.networks_stylegan2")
    from gantrack_tpu.models.torch_compat import generator_params_from_torch

    torch.manual_seed(0)
    g_ref = nets.Generator(
        z_dim=16, c_dim=0, w_dim=16, img_resolution=32, img_channels=1,
        mapping_kwargs={"num_layers": 2},
        channel_base=256, channel_max=64, num_fp16_res=0,
    ).eval()

    g = _build_ours()
    variables = generator_params_from_torch(g_ref)
    variables = jax.tree.map(jnp.asarray, variables)

    z = np.random.default_rng(5).standard_normal((2, 16)).astype(np.float32)
    with torch.no_grad():
        want = g_ref(torch.from_numpy(z.copy()), None, noise_mode="const", force_fp32=True)
    got = g.apply(variables, jnp.asarray(z), None, noise_mode="const")
    np.testing.assert_allclose(
        np.asarray(got), np.transpose(want.numpy(), (0, 2, 3, 1)), rtol=1e-3, atol=1e-4
    )


@requires_reference
def test_discriminator_matches_reference_with_transplanted_weights():
    torch = pytest.importorskip("torch")
    nets = import_reference_module("training.networks_stylegan2")
    from gantrack_tpu.models.torch_compat import discriminator_params_from_torch

    torch.manual_seed(0)
    d_ref = nets.Discriminator(
        c_dim=0, img_resolution=32, img_channels=1,
        channel_base=256, channel_max=64, num_fp16_res=0,
    ).eval()
    d = Discriminator(c_dim=0, img_resolution=32, img_channels=1,
                      channel_base=256, channel_max=64, num_fp16_res=0)
    variables = jax.tree.map(jnp.asarray, discriminator_params_from_torch(d_ref))

    x = np.random.default_rng(6).standard_normal((4, 32, 32, 1)).astype(np.float32)
    with torch.no_grad():
        want = d_ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()), None, force_fp32=True)
    got = d.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-3, atol=1e-4)


@requires_reference
def test_truncation_matches_reference():
    torch = pytest.importorskip("torch")
    nets = import_reference_module("training.networks_stylegan2")
    from gantrack_tpu.models.torch_compat import generator_params_from_torch

    torch.manual_seed(1)
    g_ref = nets.Generator(
        z_dim=16, c_dim=0, w_dim=16, img_resolution=32, img_channels=1,
        mapping_kwargs={"num_layers": 2},
        channel_base=256, channel_max=64, num_fp16_res=0,
    ).eval()
    with torch.no_grad():
        g_ref.mapping.w_avg.copy_(torch.randn(16))

    g = _build_ours()
    variables = jax.tree.map(jnp.asarray, generator_params_from_torch(g_ref))
    z = np.random.default_rng(7).standard_normal((2, 16)).astype(np.float32)
    with torch.no_grad():
        want = g_ref.mapping(torch.from_numpy(z.copy()), None, truncation_psi=0.5)
    got = g.apply(variables, jnp.asarray(z), None, truncation_psi=0.5,
                  method=lambda m, z, c, **kw: m.mapping(z, c, **kw))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)
