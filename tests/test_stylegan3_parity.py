"""StyleGAN3 weight-transplant forward parity vs the reference
``networks_stylegan3.py`` (t and r configs, plus the user transform hook) —
the same strength of check the SG2 suite has."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantrack_tpu.models.stylegan3 import Generator as SG3Generator
from conftest import has_reference, import_reference_module

requires_reference = pytest.mark.skipif(not has_reference(), reason="reference tree not present")

CFG = dict(z_dim=16, c_dim=0, w_dim=16, img_resolution=32, img_channels=1)


def _build(cfg_name: str):
    torch = pytest.importorskip("torch")
    nets = import_reference_module("training.networks_stylegan3")
    from gantrack_tpu.models.torch_compat import sg3_generator_params_from_torch

    mult = 2 if cfg_name == "stylegan3-r" else 1
    common = dict(channel_base=256 * mult, channel_max=64 * mult)
    torch.manual_seed(0)
    g_ref = nets.Generator(
        **CFG, mapping_kwargs={"num_layers": 2},
        conv_kernel=1 if cfg_name == "stylegan3-r" else 3,
        use_radial_filters=cfg_name == "stylegan3-r",
        num_fp16_res=0, **common,
    ).eval()
    g = SG3Generator(
        **CFG, mapping_kwargs=dict(num_layers=2),
        conv_kernel=1 if cfg_name == "stylegan3-r" else 3,
        use_radial_filters=cfg_name == "stylegan3-r",
        num_fp16_res=0, **common,
    )
    variables = jax.tree.map(jnp.asarray, sg3_generator_params_from_torch(g_ref))
    return g_ref, g, variables, torch


@requires_reference
@pytest.mark.parametrize("cfg_name", ["stylegan3-t", "stylegan3-r"])
def test_sg3_generator_matches_reference_with_transplanted_weights(cfg_name):
    g_ref, g, variables, torch = _build(cfg_name)
    z = np.random.default_rng(5).standard_normal((2, 16)).astype(np.float32)
    with torch.no_grad():
        want = g_ref(torch.from_numpy(z.copy()), None, force_fp32=True)
    got = g.apply(variables, jnp.asarray(z), None, force_fp32=True)
    np.testing.assert_allclose(
        np.asarray(got), np.transpose(want.numpy(), (0, 2, 3, 1)),
        rtol=2e-3, atol=2e-3,
    )


@requires_reference
def test_sg3_user_transform_matches_reference():
    """Injecting a rotation/translation into the input transform buffer
    must shift both implementations identically (the equivariance-metric
    mechanism, ``gen_images.py:38-48``)."""
    g_ref, g, variables, torch = _build("stylegan3-t")
    a = 2 * np.pi / 8
    m = np.eye(3, dtype=np.float32)
    m[0, 0] = np.cos(a); m[0, 1] = np.sin(a); m[0, 2] = 0.1
    m[1, 0] = -np.sin(a); m[1, 1] = np.cos(a); m[1, 2] = -0.05
    minv = np.linalg.inv(m).astype(np.float32)

    with torch.no_grad():
        g_ref.synthesis.input.transform.copy_(torch.from_numpy(minv))
    v = jax.tree.map(lambda x: x, variables)
    consts = dict(v["consts"]); syn = dict(consts["synthesis"]); inp = dict(syn["input"])
    inp["transform"] = jnp.asarray(minv)
    syn["input"] = inp; consts["synthesis"] = syn; v["consts"] = consts

    z = np.random.default_rng(7).standard_normal((1, 16)).astype(np.float32)
    with torch.no_grad():
        want = g_ref(torch.from_numpy(z.copy()), None, force_fp32=True)
    got = g.apply(v, jnp.asarray(z), None, force_fp32=True)
    np.testing.assert_allclose(
        np.asarray(got), np.transpose(want.numpy(), (0, 2, 3, 1)),
        rtol=2e-3, atol=2e-3,
    )


@requires_reference
def test_sg3_magnitude_ema_update_matches_reference():
    g_ref, g, variables, torch = _build("stylegan3-t")
    z = np.random.default_rng(9).standard_normal((2, 16)).astype(np.float32)
    with torch.no_grad():
        g_ref(torch.from_numpy(z.copy()), None, update_emas=True, force_fp32=True)
    _, mutated = g.apply(
        variables, jnp.asarray(z), None, update_emas=True, force_fp32=True,
        mutable=["emas"],
    )
    for name in g_ref.synthesis.layer_names:
        ref_ema = float(getattr(g_ref.synthesis, name).magnitude_ema)
        got_ema = float(mutated["emas"]["synthesis"][name]["magnitude_ema"])
        np.testing.assert_allclose(got_ema, ref_ema, rtol=1e-3), name
