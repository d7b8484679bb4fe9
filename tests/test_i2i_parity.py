"""CycleGAN/pix2pix network parity: weight-transplant forward equality vs
the reference ``pytorch-CycleGAN-and-pix2pix/models/networks.py``, plus the
test_i2i CLI's HTML results sheet."""

import importlib.util
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference/src/models/pytorch-CycleGAN-and-pix2pix/models/networks.py"
requires_reference = pytest.mark.skipif(not os.path.isfile(REF),
                                        reason="reference tree not present")


def _ref_networks():
    spec = importlib.util.spec_from_file_location("cyclegan_networks", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@requires_reference
def test_resnet_generator_transplant_parity():
    from gantrack_tpu.models.image2image import ResnetGenerator
    from gantrack_tpu.models.torch_compat import resnet_generator_params_from_torch

    nets = _ref_networks()
    torch.manual_seed(0)
    import functools
    norm = functools.partial(torch.nn.InstanceNorm2d, affine=False,
                             track_running_stats=False)
    g_ref = nets.ResnetGenerator(3, 3, ngf=16, norm_layer=norm, n_blocks=6).eval()
    g = ResnetGenerator(output_nc=3, ngf=16, n_blocks=6)
    params = jax.tree.map(jnp.asarray, resnet_generator_params_from_torch(g_ref, n_blocks=6))

    x = np.random.default_rng(0).standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = g_ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    got = g.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got), np.transpose(want.numpy(), (0, 2, 3, 1)),
        rtol=1e-3, atol=1e-4,
    )


@requires_reference
def test_nlayer_discriminator_transplant_parity():
    from gantrack_tpu.models.image2image import NLayerDiscriminator
    from gantrack_tpu.models.torch_compat import nlayer_discriminator_params_from_torch

    nets = _ref_networks()
    torch.manual_seed(1)
    import functools
    norm = functools.partial(torch.nn.InstanceNorm2d, affine=False,
                             track_running_stats=False)
    d_ref = nets.NLayerDiscriminator(3, ndf=16, n_layers=3, norm_layer=norm).eval()
    d = NLayerDiscriminator(ndf=16, n_layers=3)
    params = jax.tree.map(jnp.asarray,
                          nlayer_discriminator_params_from_torch(d_ref, n_layers=3))

    x = np.random.default_rng(1).standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = d_ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    got = d.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got), np.transpose(want.numpy(), (0, 2, 3, 1)),
        rtol=1e-3, atol=1e-4,
    )


def test_test_i2i_cli_writes_html(tmp_path):
    """test_i2i end-to-end on a 1-iteration CycleGAN checkpoint."""
    from click.testing import CliRunner
    from PIL import Image

    rng = np.random.default_rng(0)
    for phase in ("train", "test"):
        for side in "AB":
            d = tmp_path / "data" / f"{phase}{side}"
            d.mkdir(parents=True)
            for i in range(2):
                Image.fromarray(
                    rng.integers(0, 255, (32, 32, 3), dtype=np.uint8), "RGB"
                ).save(d / f"im{i}.png")

    from gantrack_tpu.tools.train_i2i import main as train_main
    from gantrack_tpu.tools.test_i2i import main as test_main

    r = CliRunner().invoke(train_main, [
        "--dataroot", str(tmp_path / "data"), "--name", "t", "--model", "cycle_gan",
        "--ngf", "8", "--ndf", "8", "--load-size", "32", "--batch-size", "1",
        "--checkpoints-dir", str(tmp_path / "ckpt"), "--max-iters", "1",
        "--n-epochs", "1", "--n-epochs-decay", "0",
    ], catch_exceptions=False)
    assert r.exit_code == 0, r.output

    r = CliRunner().invoke(test_main, [
        "--dataroot", str(tmp_path / "data"), "--name", "t", "--model", "cycle_gan",
        "--ngf", "8", "--load-size", "32", "--num-test", "2",
        "--checkpoints-dir", str(tmp_path / "ckpt"),
        "--results-dir", str(tmp_path / "results"),
    ], catch_exceptions=False)
    assert r.exit_code == 0, r.output
    web = tmp_path / "results" / "t" / "test_latest"
    assert (web / "index.html").exists()
    pngs = list((web / "images").glob("*.png"))
    labels = {p.name.rsplit("_", 1)[-1] for p in pngs}
    assert {"B.png", "A.png"} & labels or pngs, pngs
    assert any("fake_B" in p.name for p in pngs)
    assert any("rec_A" in p.name for p in pngs)


@requires_reference
def test_unet_generator_transplant_parity():
    import functools

    from gantrack_tpu.models.image2image import UnetGenerator
    from gantrack_tpu.models.torch_compat import unet_generator_params_from_torch

    nets = _ref_networks()
    torch.manual_seed(2)
    norm = functools.partial(torch.nn.InstanceNorm2d, affine=False,
                             track_running_stats=False)
    num_downs = 6
    g_ref = nets.UnetGenerator(3, 3, num_downs=num_downs, ngf=8,
                               norm_layer=norm, use_dropout=False).eval()
    g = UnetGenerator(output_nc=3, num_downs=num_downs, ngf=8)
    params = jax.tree.map(jnp.asarray,
                          unet_generator_params_from_torch(g_ref, num_downs))

    x = np.random.default_rng(2).standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = g_ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    got = g.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got), np.transpose(want.numpy(), (0, 2, 3, 1)),
        rtol=1e-3, atol=1e-4,
    )


@requires_reference
def test_test_i2i_consumes_reference_pth(tmp_path):
    """test_i2i translates from a reference-layout checkpoint dir
    (<name>/latest_net_G_A.pth state dicts, base_model.save_networks) —
    artifact-migration parity for the i2i family."""
    import functools

    from click.testing import CliRunner
    from PIL import Image

    from gantrack_tpu.models.torch_compat import (
        i2i_generator_params_from_pth, resnet_generator_params_from_torch,
    )

    nets = _ref_networks()
    torch.manual_seed(0)
    norm = functools.partial(torch.nn.InstanceNorm2d, affine=False,
                             track_running_stats=False)
    run_dir = tmp_path / "ckpt" / "t"
    run_dir.mkdir(parents=True)
    refs = {}
    for side in ("G_A", "G_B"):
        g_ref = nets.ResnetGenerator(3, 3, ngf=8, norm_layer=norm,
                                     n_blocks=9).eval()
        torch.save(g_ref.state_dict(), run_dir / f"latest_net_{side}.pth")
        refs[side] = g_ref

    # converter equivalence: .pth file == live module conversion
    got = i2i_generator_params_from_pth(
        str(run_dir / "latest_net_G_A.pth"), "resnet_9blocks")
    want = resnet_generator_params_from_torch(refs["G_A"], n_blocks=9)
    flat_g = jax.tree_util.tree_leaves_with_path(got)
    flat_w = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(want)}
    assert len(flat_g) == len(flat_w) > 10
    for k, v in flat_g:
        np.testing.assert_array_equal(v, flat_w[jax.tree_util.keystr(k)])

    rng = np.random.default_rng(0)
    for side in "AB":
        d = tmp_path / "data" / f"test{side}"
        d.mkdir(parents=True)
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8),
                        "RGB").save(d / "im0.png")

    from gantrack_tpu.tools.test_i2i import main as test_main

    r = CliRunner().invoke(test_main, [
        "--dataroot", str(tmp_path / "data"), "--name", "t",
        "--model", "cycle_gan", "--ngf", "8", "--load-size", "32",
        "--num-test", "1", "--checkpoints-dir", str(tmp_path / "ckpt"),
        "--results-dir", str(tmp_path / "results"),
    ], catch_exceptions=False)
    assert r.exit_code == 0, r.output
    web = tmp_path / "results" / "t" / "test_latest"
    assert (web / "index.html").exists()
    assert any("fake_B" in p.name for p in (web / "images").glob("*.png"))
