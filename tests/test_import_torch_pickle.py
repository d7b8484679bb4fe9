"""import_torch_pickle CLI: a reference network-snapshot pickle round-trips
into a gantrack checkpoint with exact weight transplant
(reference legacy.py:22-59 consumption path)."""

import pickle

import numpy as np
import pytest
from click.testing import CliRunner

from tests.conftest import has_reference, import_reference_module

requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference tree not present")

pytestmark = pytest.mark.slow  # torch module construction + state init


@requires_reference
def test_import_torch_pickle_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    nets = import_reference_module("training.networks_stylegan2")

    from gantrack_tpu.models.torch_compat import generator_params_from_torch
    from gantrack_tpu.tools.import_torch_pickle import main
    from gantrack_tpu.utils.checkpoint import load_checkpoint

    torch.manual_seed(0)
    kw = dict(z_dim=16, c_dim=0, w_dim=16, img_resolution=32, img_channels=1,
              mapping_kwargs={"num_layers": 2},
              channel_base=256, channel_max=64, num_fp16_res=0)
    g_ref = nets.Generator(**kw).eval()
    g_ema = nets.Generator(**kw).eval()
    d_ref = nets.Discriminator(c_dim=0, img_resolution=32, img_channels=1,
                               channel_base=256, channel_max=64,
                               num_fp16_res=0).eval()
    src = tmp_path / "network-snapshot-000000.pkl"
    with open(src, "wb") as f:
        pickle.dump({"G": g_ref, "D": d_ref, "G_ema": g_ema}, f)

    dst = tmp_path / "out"
    res = CliRunner().invoke(main, ["--src", str(src), "--dst", str(dst)],
                             catch_exceptions=False)
    assert res.exit_code == 0, res.output

    state = load_checkpoint(str(dst / "state-00000000"), None)
    want = generator_params_from_torch(g_ema)

    def leaves(tree):
        out = {}
        def rec(node, p):
            if isinstance(node, dict):
                for k, v in node.items():
                    rec(v, p + (k,))
            else:
                out[p] = np.asarray(node)
        rec(tree, ())
        return out

    got = leaves(state["params_g_ema"])
    ref = leaves(want["params"])
    assert set(got) == set(ref) and len(got) > 10
    for k in ref:
        np.testing.assert_array_equal(got[k], ref[k].astype(got[k].dtype))
    # w_avg EMA buffer travels too
    np.testing.assert_array_equal(
        leaves(state["emas_g"])[("mapping", "w_avg")],
        leaves(want["emas"])[("mapping", "w_avg")])


@requires_reference
def test_resume_transplants_reference_pickle(tmp_path):
    """--resume=<pkl> path: weights transplant into a live train state
    (reference resume semantics, legacy.py:22-59 + training_loop
    copy_params_and_buffers); wrong architecture raises a named error."""
    torch = pytest.importorskip("torch")
    nets = import_reference_module("training.networks_stylegan2")

    import jax
    import jax.numpy as jnp

    from gantrack_tpu.models.stylegan2 import Discriminator, Generator
    from gantrack_tpu.models.torch_compat import (
        generator_params_from_torch, load_network_pickle,
        transplant_into_state,
    )
    from gantrack_tpu.training import create_train_state, lazy_reg_adam

    torch.manual_seed(1)
    kw = dict(z_dim=16, c_dim=0, w_dim=16, img_resolution=32, img_channels=1,
              mapping_kwargs={"num_layers": 2},
              channel_base=256, channel_max=64, num_fp16_res=0)
    g_ref = nets.Generator(**kw).eval()
    g_ema = nets.Generator(**kw).eval()
    d_ref = nets.Discriminator(c_dim=0, img_resolution=32, img_channels=1,
                               channel_base=256, channel_max=64,
                               num_fp16_res=0).eval()
    src = tmp_path / "network-snapshot-000123.pkl"
    with open(src, "wb") as f:
        pickle.dump({"G": g_ref, "D": d_ref, "G_ema": g_ema}, f)

    def make_state(cbase):
        g = Generator(z_dim=16, c_dim=0, w_dim=16, img_resolution=32,
                      img_channels=1, mapping_kwargs=dict(num_layers=2),
                      synthesis_kwargs=dict(channel_base=cbase))
        d = Discriminator(c_dim=0, img_resolution=32, img_channels=1,
                          channel_base=cbase)
        return create_train_state(
            g, d, jax.random.PRNGKey(0), lazy_reg_adam(0.0025, reg_interval=4),
            lazy_reg_adam(0.0025, reg_interval=16),
            z_dim=16, c_dim=0, img_resolution=32, img_channels=1)

    state = transplant_into_state(
        make_state(256), *load_network_pickle(str(src)))
    want = generator_params_from_torch(g_ema)["params"]
    got = state.params_g_ema
    np.testing.assert_array_equal(
        np.asarray(got["mapping"]["fc0"]["weight"]),
        np.asarray(want["mapping"]["fc0"]["weight"],
                   np.asarray(got["mapping"]["fc0"]["weight"]).dtype))
    # optimizer state stays fresh (reference: weights/buffers only)
    assert int(state.step) == 0

    with pytest.raises(ValueError, match="params_g"):
        transplant_into_state(make_state(512), *load_network_pickle(str(src)))


@requires_reference
def test_resolve_network_accepts_pickle(tmp_path):
    """Every inference tool's --network resolves reference pickles via
    utils.checkpoint.resolve_network (parity: the reference's tools all
    consume legacy.load_network_pkl pickles)."""
    torch = pytest.importorskip("torch")
    nets = import_reference_module("training.networks_stylegan2")

    from gantrack_tpu.utils.checkpoint import resolve_network

    torch.manual_seed(2)
    kw = dict(z_dim=16, c_dim=0, w_dim=16, img_resolution=32, img_channels=1,
              mapping_kwargs={"num_layers": 2},
              channel_base=256, channel_max=64, num_fp16_res=0)
    src = tmp_path / "network-snapshot-000007.pkl"
    with open(src, "wb") as f:
        pickle.dump({"G": nets.Generator(**kw).eval(),
                     "D": nets.Discriminator(
                         c_dim=0, img_resolution=32, img_channels=1,
                         channel_base=256, channel_max=64,
                         num_fp16_res=0).eval(),
                     "G_ema": nets.Generator(**kw).eval()}, f)

    state, path = resolve_network(str(src))
    assert path == str(src)
    for key in ("params_g_ema", "emas_g", "consts_g", "params_g", "params_d"):
        assert key in state, key
    assert "noise_consts" in state["consts_g"]

    # the tools' vars_g assembly + a forward pass works off this state
    import jax
    import jax.numpy as jnp

    from gantrack_tpu.models.stylegan2 import Generator

    g = Generator(z_dim=16, c_dim=0, w_dim=16, img_resolution=32,
                  img_channels=1, mapping_kwargs=dict(num_layers=2),
                  synthesis_kwargs=dict(channel_base=256))
    vars_g = {"params": state["params_g_ema"], "emas": state["emas_g"],
              **state["consts_g"]}
    img = g.apply(vars_g, jnp.zeros((1, 16)), None, noise_mode="const")
    assert img.shape == (1, 32, 32, 1) and bool(jnp.isfinite(img).all())


@requires_reference
def test_resolve_network_detects_sg3_pickle(tmp_path):
    """resolve_network converts StyleGAN3 pickles too (Fourier-input
    detection → sg3 converter; consts_g carries the consts collection)."""
    torch = pytest.importorskip("torch")
    sg3 = import_reference_module("training.networks_stylegan3")
    sg2 = import_reference_module("training.networks_stylegan2")

    from gantrack_tpu.utils.checkpoint import resolve_network

    torch.manual_seed(4)
    g_kw = dict(z_dim=16, c_dim=0, w_dim=16, img_resolution=32,
                img_channels=1, mapping_kwargs={"num_layers": 2},
                channel_base=256, channel_max=64, num_fp16_res=0)
    src = tmp_path / "network-snapshot-000009.pkl"
    with open(src, "wb") as f:
        pickle.dump({"G": sg3.Generator(**g_kw).eval(),
                     "D": sg2.Discriminator(
                         c_dim=0, img_resolution=32, img_channels=1,
                         channel_base=256, channel_max=64,
                         num_fp16_res=0).eval(),
                     "G_ema": sg3.Generator(**g_kw).eval()}, f)

    state, _ = resolve_network(str(src))
    assert "consts" in state["consts_g"]
    assert "input" in state["consts_g"]["consts"]["synthesis"]
    assert "magnitude_ema" in next(iter(
        v for k, v in state["emas_g"]["synthesis"].items()))


@requires_reference
def test_resume_transplants_sg3_pickle(tmp_path):
    """--resume with a StyleGAN3 pickle picks the SG3 converter and
    carries the consts collection (not SG2's noise_consts)."""
    torch = pytest.importorskip("torch")
    sg3 = import_reference_module("training.networks_stylegan3")
    sg2 = import_reference_module("training.networks_stylegan2")

    import jax

    from gantrack_tpu.models.torch_compat import (
        load_network_pickle, transplant_into_state,
    )
    from gantrack_tpu.tools.train import build_generator_from_cfg
    from gantrack_tpu.models.stylegan2 import Discriminator
    from gantrack_tpu.training import create_train_state, lazy_reg_adam

    torch.manual_seed(5)
    g_kw = dict(z_dim=16, c_dim=0, w_dim=16, img_resolution=32,
                img_channels=1, mapping_kwargs={"num_layers": 2},
                channel_base=256, channel_max=64, num_fp16_res=0)
    src = tmp_path / "network-snapshot-000011.pkl"
    with open(src, "wb") as f:
        pickle.dump({"G": sg3.Generator(**g_kw).eval(),
                     "D": sg2.Discriminator(
                         c_dim=0, img_resolution=32, img_channels=1,
                         channel_base=256, channel_max=64,
                         num_fp16_res=0).eval(),
                     "G_ema": sg3.Generator(**g_kw).eval()}, f)

    g = build_generator_from_cfg(
        "stylegan3-t", resolution=32, channels=1, c_dim=0, cbase=256,
        cmax=64, map_depth=2, fp32=True, z_dim=16, w_dim=16)
    d = Discriminator(c_dim=0, img_resolution=32, img_channels=1,
                      channel_base=256, channel_max=64)
    state = create_train_state(
        g, d, jax.random.PRNGKey(0), lazy_reg_adam(0.0025, reg_interval=4),
        lazy_reg_adam(0.0025, reg_interval=16),
        z_dim=16, c_dim=0, img_resolution=32, img_channels=1)
    state = transplant_into_state(state, *load_network_pickle(str(src)))
    assert "consts" in state.consts_g
    assert "input" in state.consts_g["consts"]["synthesis"]
