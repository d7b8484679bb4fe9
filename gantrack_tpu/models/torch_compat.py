"""Import reference (PyTorch StyleGAN2) weights into gantrack_tpu models.

Serves two purposes:
* parity testing — build the reference network, copy its weights, and
  assert our flax model produces the same outputs;
* a ``legacy.load_network_pkl``-style migration path (reference
  ``legacy.py:22-59``): users with reference snapshot pickles can convert
  them to gantrack_tpu checkpoints.

The mapping handles the layout changes of this framework:
NCHW→NHWC activations (OIHW→HWIO conv weights, CHW→HWC const inputs) and
the discriminator epilogue's flatten order (channel-fastest here).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _t(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _conv_w(x) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(_t(x), (2, 3, 1, 0))


def _fc_w(x) -> np.ndarray:
    """[out, in] -> [in, out]."""
    return np.transpose(_t(x), (1, 0))


def _set(tree: Dict[str, Any], path: str, value: np.ndarray) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _fc(tree, prefix: str, sd: Mapping[str, Any], torch_prefix: str) -> None:
    _set(tree, f"{prefix}/weight", _fc_w(sd[f"{torch_prefix}.weight"]))
    if f"{torch_prefix}.bias" in sd:
        _set(tree, f"{prefix}/bias", _t(sd[f"{torch_prefix}.bias"]))


def mapping_params_from_torch(sd: Mapping[str, Any], num_layers: int, prefix: str = "") -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    for i in range(num_layers):
        _fc(params, f"fc{i}", sd, f"{prefix}fc{i}")
    if f"{prefix}embed.weight" in sd:
        _fc(params, "embed", sd, f"{prefix}embed")
    return params


def generator_params_from_torch(g_torch) -> Dict[str, Dict[str, Any]]:
    """Convert a reference ``Generator`` module to flax variable dicts.

    Returns ``{"params": ..., "emas": ..., "noise_consts": ...}``.
    """
    sd = {k: _t(v) for k, v in g_torch.state_dict().items()}
    params: Dict[str, Any] = {}
    emas: Dict[str, Any] = {}
    noise_consts: Dict[str, Any] = {}

    num_mapping_layers = g_torch.mapping.num_layers
    params["mapping"] = mapping_params_from_torch(sd, num_mapping_layers, "mapping.")
    if "mapping.w_avg" in sd:
        emas["mapping"] = {"w_avg": sd["mapping.w_avg"]}

    for res in g_torch.synthesis.block_resolutions:
        bp: Dict[str, Any] = {}
        bn: Dict[str, Any] = {}
        base = f"synthesis.b{res}"
        if f"{base}.const" in sd:
            bp["const"] = np.transpose(sd[f"{base}.const"], (1, 2, 0))
        for conv in ("conv0", "conv1"):
            if f"{base}.{conv}.weight" not in sd:
                continue
            cp: Dict[str, Any] = {
                "weight": _conv_w(sd[f"{base}.{conv}.weight"]),
                "bias": sd[f"{base}.{conv}.bias"],
            }
            _fc(cp, "affine", sd, f"{base}.{conv}.affine")
            if f"{base}.{conv}.noise_strength" in sd:
                cp["noise_strength"] = sd[f"{base}.{conv}.noise_strength"]
                bn[conv] = {"noise_const": sd[f"{base}.{conv}.noise_const"]}
            bp[conv] = cp
        if f"{base}.torgb.weight" in sd:
            tp: Dict[str, Any] = {
                "weight": _conv_w(sd[f"{base}.torgb.weight"]),
                "bias": sd[f"{base}.torgb.bias"],
            }
            _fc(tp, "affine", sd, f"{base}.torgb.affine")
            bp["torgb"] = tp
        if f"{base}.skip.weight" in sd:
            bp["skip"] = {"weight": _conv_w(sd[f"{base}.skip.weight"])}
        params.setdefault("synthesis", {})[f"b{res}"] = bp
        if bn:
            noise_consts.setdefault("synthesis", {})[f"b{res}"] = bn

    return {"params": params, "emas": {"mapping": emas.get("mapping", {})}, "noise_consts": noise_consts}


def discriminator_params_from_torch(d_torch) -> Dict[str, Dict[str, Any]]:
    """Convert a reference ``Discriminator`` module to flax params."""
    sd = {k: _t(v) for k, v in d_torch.state_dict().items()}
    params: Dict[str, Any] = {}

    for res in d_torch.block_resolutions:
        bp: Dict[str, Any] = {}
        base = f"b{res}"
        for conv in ("fromrgb", "conv0", "conv1"):
            if f"{base}.{conv}.weight" not in sd:
                continue
            bp[conv] = {"weight": _conv_w(sd[f"{base}.{conv}.weight"])}
            if f"{base}.{conv}.bias" in sd:
                bp[conv]["bias"] = sd[f"{base}.{conv}.bias"]
        if f"{base}.skip.weight" in sd:
            bp["skip"] = {"weight": _conv_w(sd[f"{base}.skip.weight"])}
        params[base] = bp

    if any(k.startswith("mapping.") for k in sd):
        params["mapping"] = mapping_params_from_torch(
            sd, d_torch.mapping.num_layers, "mapping."
        )

    # Epilogue: conv then flatten-sensitive fc.
    ep: Dict[str, Any] = {}
    if "b4.fromrgb.weight" in sd:
        ep["fromrgb"] = {
            "weight": _conv_w(sd["b4.fromrgb.weight"]),
            "bias": sd["b4.fromrgb.bias"],
        }
    ep["conv"] = {"weight": _conv_w(sd["b4.conv.weight"]), "bias": sd["b4.conv.bias"]}
    fc_w = sd["b4.fc.weight"]  # [out, C*H*W] with NCHW flatten
    out_features = fc_w.shape[0]
    in_ch = sd["b4.conv.weight"].shape[0]
    res = 4
    fc_w = fc_w.reshape(out_features, in_ch, res, res).transpose(0, 2, 3, 1).reshape(out_features, -1)
    ep["fc"] = {"weight": fc_w.T, "bias": sd["b4.fc.bias"]}
    ep["out"] = {"weight": _fc_w(sd["b4.out.weight"]), "bias": sd["b4.out.bias"]}
    params["b4"] = ep
    return {"params": params}


def sg3_generator_params_from_torch(g_torch) -> Dict[str, Dict[str, Any]]:
    """Convert a reference StyleGAN3 ``Generator``
    (``networks_stylegan3.py:489-515``) to flax variable dicts:
    ``{"params", "emas", "consts"}``.

    Layer modules are named ``L{idx}_{out_size}_{out_channels}`` in both
    implementations; the input layer's Fourier buffers (freqs/phases) and
    the user transform land in the ``consts`` collection, per-layer
    ``magnitude_ema`` and the mapping ``w_avg`` in ``emas``.
    """
    sd = {k: _t(v) for k, v in g_torch.state_dict().items()}
    params: Dict[str, Any] = {}
    emas: Dict[str, Any] = {"mapping": {"w_avg": sd["mapping.w_avg"]}}
    consts: Dict[str, Any] = {}

    params["mapping"] = mapping_params_from_torch(sd, g_torch.mapping.num_layers, "mapping.")

    syn_p: Dict[str, Any] = {}
    syn_e: Dict[str, Any] = {}
    inp: Dict[str, Any] = {"weight": sd["synthesis.input.weight"]}
    _fc(inp, "affine", sd, "synthesis.input.affine")
    syn_p["input"] = inp
    consts["synthesis"] = {
        "input": {
            "freqs": sd["synthesis.input.freqs"],
            "phases": sd["synthesis.input.phases"],
            "transform": sd["synthesis.input.transform"],
        }
    }

    for name in g_torch.synthesis.layer_names:
        base = f"synthesis.{name}"
        lp: Dict[str, Any] = {
            "weight": _conv_w(sd[f"{base}.weight"]),
            "bias": sd[f"{base}.bias"],
        }
        _fc(lp, "affine", sd, f"{base}.affine")
        syn_p[name] = lp
        syn_e[name] = {"magnitude_ema": sd[f"{base}.magnitude_ema"]}

    params["synthesis"] = syn_p
    emas["synthesis"] = syn_e
    return {"params": params, "emas": emas, "consts": consts}


def _convtranspose_w(x) -> np.ndarray:
    """torch ConvTranspose2d [in, out, kh, kw] → flax ConvTranspose
    [kh, kw, in, out] with spatial flip (lax.conv_transpose applies the
    kernel as a correlation; torch's adjoint scatter is the flipped one)."""
    return np.transpose(_t(x), (2, 3, 0, 1))[::-1, ::-1]


def resnet_generator_params_from_torch(g_torch, n_blocks: int = 9) -> Dict[str, Any]:
    """Reference CycleGAN ``ResnetGenerator`` (``networks.py:315-377``,
    instance norm: no norm params) → our flax ``ResnetGenerator`` params."""
    sd = {k: _t(v) for k, v in g_torch.state_dict().items()}

    def conv(i):
        p = {"kernel": _conv_w(sd[f"model.{i}.weight"])}
        if f"model.{i}.bias" in sd:
            p["bias"] = sd[f"model.{i}.bias"]
        return p

    params: Dict[str, Any] = {
        "Conv_0": conv(1), "Conv_1": conv(4), "Conv_2": conv(7),
    }
    for b in range(n_blocks):
        base = f"model.{10 + b}.conv_block"
        params[f"ResnetBlock_{b}"] = {
            "Conv_0": {"kernel": _conv_w(sd[f"{base}.1.weight"]),
                       "bias": sd[f"{base}.1.bias"]},
            "Conv_1": {"kernel": _conv_w(sd[f"{base}.5.weight"]),
                       "bias": sd[f"{base}.5.bias"]},
        }
    for j, idx in enumerate((10 + n_blocks, 13 + n_blocks)):
        params[f"ConvTranspose_{j}"] = {
            "kernel": _convtranspose_w(sd[f"model.{idx}.weight"]),
            "bias": sd[f"model.{idx}.bias"],
        }
    params["Conv_3"] = conv(17 + n_blocks)  # after CT,IN,ReLU ×2 and the pad
    return params


def nlayer_discriminator_params_from_torch(d_torch, n_layers: int = 3) -> Dict[str, Any]:
    """Reference ``NLayerDiscriminator`` (``networks.py:538-583``) → flax."""
    sd = {k: _t(v) for k, v in d_torch.state_dict().items()}
    idxs = [0]                                   # first conv (no norm after)
    i = 2                                        # skip LeakyReLU
    for _ in range(1, n_layers + 1):
        idxs.append(i)
        i += 3                                   # conv, norm, lrelu
    idxs.append(i)                               # final 1-channel conv
    params: Dict[str, Any] = {}
    for j, idx in enumerate(idxs):
        params[f"Conv_{j}"] = {
            "kernel": _conv_w(sd[f"model.{idx}.weight"]),
            "bias": sd[f"model.{idx}.bias"],
        }
    return params


def unet_generator_params_from_torch(g_torch, num_downs: int) -> Dict[str, Any]:
    """Reference pix2pix ``UnetGenerator`` (``networks.py:436-530``,
    instance norm) → our flax ``UnetGenerator`` params.

    The torch module nests ``UnetSkipConnectionBlock``s with per-level
    sequential indices (outermost: down 0 / sub 1 / up 3; middle:
    down 1 / sub 3 / up 5; innermost: down 1 / up 3); the flax blocks
    nest as ``UnetSkipBlock_0`` scopes with ``Conv_0``/``ConvTranspose_0``.
    """
    sd = {k: _t(v) for k, v in g_torch.state_dict().items()}

    def conv(prefix):
        p = {"kernel": _conv_w(sd[f"{prefix}.weight"])}
        if f"{prefix}.bias" in sd:
            p["bias"] = sd[f"{prefix}.bias"]
        return p

    def ct(prefix):
        return {"kernel": _convtranspose_w(sd[f"{prefix}.weight"]),
                "bias": sd[f"{prefix}.bias"]}

    # Flax constructs the blocks innermost-first in UnetGenerator.__call__,
    # so they are *siblings*: UnetSkipBlock_0 = innermost ...
    # UnetSkipBlock_{num_downs-1} = outermost.
    params: Dict[str, Any] = {}

    def walk(prefix, level):
        outermost = level == 0
        innermost = level == num_downs - 1
        down_idx = 0 if outermost else 1
        up_idx = 3 if (outermost or innermost) else 5
        params[f"UnetSkipBlock_{num_downs - 1 - level}"] = {
            "Conv_0": conv(f"{prefix}model.{down_idx}"),
            "ConvTranspose_0": ct(f"{prefix}model.{up_idx}"),
        }
        if not innermost:
            sub_idx = 1 if outermost else 3
            walk(f"{prefix}model.{sub_idx}.", level + 1)

    walk("model.", 0)
    return params


def load_network_pickle(path: str, reference_path: str = None):
    """Unpickle a reference ``network-snapshot-*.pkl`` → (G, D, G_ema).

    Counterpart of the reference's ``legacy.load_network_pkl``
    (``legacy.py:22-59``).  The snapshot embeds class source via
    ``persistence.persistent_class`` which re-imports ``torch_utils``/
    ``dnnlib`` — pass ``reference_path`` (a stylegan3 checkout) if those
    packages aren't already importable.
    """
    import os
    import pickle
    import sys
    import types

    reference_path = reference_path or os.environ.get("GANTRACK_REFERENCE")
    added_path = bool(reference_path) and reference_path not in sys.path
    if added_path:
        # Added only around the unpickle (not via PYTHONPATH, not left in
        # place) so the reference tree's generic module names (training,
        # metrics, …) can't shadow later imports in this process.
        sys.path.insert(0, reference_path)
    import torch  # noqa: F401  (required by the pickle)

    if "pkg_resources" not in sys.modules:
        # The reference's ops import pkg_resources (gone from modern
        # setuptools) just for parse_version; provide a stand-in so the
        # persistent classes unpickle on current Pythons.
        try:
            import pkg_resources  # noqa: F401
        except ImportError:
            from packaging.version import parse as _parse_version

            stub = types.ModuleType("pkg_resources")
            stub.parse_version = _parse_version
            sys.modules["pkg_resources"] = stub

    try:
        with open(path, "rb") as f:
            data = pickle.load(f)
    finally:
        if added_path:
            try:
                sys.path.remove(reference_path)
            except ValueError:
                pass
    return data["G"], data["D"], data["G_ema"]


def transplant_into_state(state, g_torch, d_torch, g_ema_torch):
    """Copy reference network weights into an existing train state.

    Reference resume semantics (``training_loop_mi_multimodal.py:199-204``
    ``copy_params_and_buffers``): weights and buffers only — optimizer
    moments, ADA p, and cur_nimg stay fresh.  The state's networks must
    match the pickle's architecture; mismatches raise ``ValueError``
    naming the offending leaf (the reference silently requires matching
    names too).
    """
    import jax
    import jax.numpy as jnp

    # SG3 generators carry a Fourier input module; pick the converter and
    # the consts collection accordingly (same detection as
    # ``state_dict_from_pickle``).
    sg3 = hasattr(g_torch.synthesis, "input")
    conv = sg3_generator_params_from_torch if sg3 else generator_params_from_torch
    gv = jax.tree.map(jnp.asarray, conv(g_torch))
    gev = jax.tree.map(jnp.asarray, conv(g_ema_torch))
    dv = jax.tree.map(jnp.asarray, discriminator_params_from_torch(d_torch))

    def check(name, have, want):
        hl = jax.tree_util.tree_leaves_with_path(have)
        wl = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(want)}
        if len(hl) != len(wl):
            raise ValueError(
                f"{name}: pickle has {len(hl)} tensors, configured network "
                f"has {len(wl)} — architecture flags (--cfg/--cbase/--cmax/"
                f"--map-depth) must match the snapshot")
        for k, v in hl:
            ks = jax.tree_util.keystr(k)
            if ks not in wl:
                raise ValueError(f"{name}: unexpected tensor {ks}")
            if tuple(v.shape) != tuple(wl[ks].shape):
                raise ValueError(
                    f"{name}{ks}: pickle shape {tuple(v.shape)} != "
                    f"configured {tuple(wl[ks].shape)}")

    check("params_g", gv["params"], state.params_g)
    check("params_d", dv["params"], state.params_d)
    return state.replace(
        params_g=gv["params"],
        params_g_ema=gev["params"],
        params_d=dv["params"],
        emas_g=gev["emas"],
        consts_g=({"consts": gev["consts"]} if sg3
                  else {"noise_consts": gev["noise_consts"]}),
    )


def state_dict_from_pickle(path: str, reference_path: str = None):
    """Reference network pickle → the plain state dict every inference
    tool consumes (``params_g_ema``/``emas_g``/``consts_g``/…), so
    ``--network=<network-snapshot-*.pkl>`` works everywhere the
    reference accepts one.  Detects SG2 vs SG3 from the synthesis tree
    (SG3 carries a Fourier ``input`` module).
    """
    import jax
    import jax.numpy as jnp

    g_t, d_t, g_ema_t = load_network_pickle(path, reference_path)
    sg3 = hasattr(g_t.synthesis, "input")
    conv = sg3_generator_params_from_torch if sg3 else generator_params_from_torch
    gv = jax.tree.map(jnp.asarray, conv(g_t))
    gev = jax.tree.map(jnp.asarray, conv(g_ema_t))
    dv = jax.tree.map(jnp.asarray, discriminator_params_from_torch(d_t))
    consts = ({"consts": gev["consts"]} if sg3
              else {"noise_consts": gev["noise_consts"]})
    return {
        "params_g": gv["params"],
        "params_g_ema": gev["params"],
        "params_d": dv["params"],
        "emas_g": gev["emas"],
        "consts_g": consts,
    }


def i2i_generator_params_from_pth(path: str, netg: str = "resnet_9blocks"):
    """Reference CycleGAN/pix2pix ``<epoch>_net_G*.pth`` state dict
    (``base_model.py`` save_networks) → flax generator params, so
    ``test_i2i`` can consume reference-trained checkpoints directly."""
    import types

    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    shim = types.SimpleNamespace(state_dict=lambda: dict(sd))
    if netg.startswith("resnet"):
        return resnet_generator_params_from_torch(
            shim, n_blocks=9 if "9" in netg else 6)
    if netg.startswith("unet"):
        return unet_generator_params_from_torch(
            shim, num_downs=8 if netg == "unet_256" else 7)
    raise ValueError(f".pth import supports resnet_*/unet_* netG, got {netg!r}")
