"""StyleGAN2-ADA generator and discriminator, TPU-native.

Capability parity with the reference ``training/networks_stylegan2.py``
(architectures, equalized learning rate, demodulation, minibatch-std,
skip/resnet architectures, conditional projection discriminator), with
TPU-first design choices:

* NHWC activations / HWIO weights; modulated conv always runs the
  *unfused* "scale activations" form (one shared-weight MXU conv — see
  ``ops/modulated_conv2d.py``).
* Mixed precision uses **bfloat16** for the ``num_fp16_res`` highest
  resolutions (the reference uses fp16 + overflow pre-normalisation,
  unnecessary with bf16's fp32 exponent range); parameters stay float32.
* ``w_avg`` (mapping) lives in a flax ``emas`` variable collection,
  updated only when ``update_emas=True`` (reference
  ``networks_stylegan2.py:249-251``).
* Per-layer noise uses explicit ``noise`` RNG streams; ``const`` mode
  reads a fixed ``noise_consts`` collection for reproducible inference.
* Freeze-D (reference ``:583-590``) is exposed as
  :func:`discriminator_freeze_mask` for ``optax.masked`` — the idiomatic
  JAX equivalent of non-trainable buffers.

Reference anchors are cited per class.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..precision import high
from ..ops.bias_act import activation_funcs, bias_act
from ..ops.conv2d_resample import conv2d_resample
from ..ops.modulated_conv2d import modulated_conv2d
from ..ops.upfirdn2d import downsample2d, setup_filter, upsample2d


def normalize_2nd_moment(x: jax.Array, axis: int = -1, eps: float = 1e-8) -> jax.Array:
    """x * rsqrt(mean(x²)+eps) — reference ``networks_stylegan2.py:26-27``."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


class FullyConnected(nn.Module):
    """Equalized-LR dense layer (reference ``networks_stylegan2.py:94-128``).

    Weight stored as ``randn / lr_multiplier`` and scaled at runtime by
    ``lr_multiplier / sqrt(fan_in)``; bias scaled by ``lr_multiplier``.
    """

    out_features: int
    use_bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: Any = 0.0  # scalar or length-out_features sequence
    weight_init: float = 1.0  # initial stddev scale (SG3 uses 0 for input affines)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        w = self.param(
            "weight",
            lambda key, shape: jax.random.normal(key, shape, high())
            * (self.weight_init / self.lr_multiplier),
            (in_features, self.out_features),
        )
        weight_gain = self.lr_multiplier / np.sqrt(in_features)
        x = jnp.matmul(x, (w * weight_gain).astype(x.dtype))
        b = None
        if self.use_bias:
            bias_init = np.broadcast_to(
                np.asarray(self.bias_init, dtype=np.float32), (self.out_features,)
            )
            b = self.param(
                "bias",
                lambda key, shape: jnp.asarray(bias_init / self.lr_multiplier, high()),
                (self.out_features,),
            )
            b = b * self.lr_multiplier
        return bias_act(x, b, act=self.activation)


class Conv2dLayer(nn.Module):
    """Plain (non-modulated) conv + FIR resample + bias_act.

    Reference ``networks_stylegan2.py:133-186``.  Equalized LR gain
    ``1/sqrt(in_ch*k²)``; activation gain applied via ``bias_act``.
    """

    out_channels: int
    kernel_size: int
    use_bias: bool = True
    activation: str = "linear"
    up: int = 1
    down: int = 1
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x: jax.Array, gain: float = 1.0) -> jax.Array:
        in_channels = x.shape[-1]
        k = self.kernel_size
        w = self.param(
            "weight", nn.initializers.normal(1.0), (k, k, in_channels, self.out_channels), high()
        )
        weight_gain = 1.0 / np.sqrt(in_channels * k * k)
        f = setup_filter(list(self.resample_filter)) if (self.up > 1 or self.down > 1) else None
        x = conv2d_resample(
            x, (w * weight_gain).astype(x.dtype), f=f, up=self.up, down=self.down,
            padding=k // 2, flip_weight=(self.up == 1),
        )
        b = None
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,), high())
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b, act=self.activation, gain=act_gain, clamp=act_clamp)


class MappingNetwork(nn.Module):
    """z,c → broadcast w with running ``w_avg`` and truncation.

    Reference ``networks_stylegan2.py:191-269``.
    """

    z_dim: int
    c_dim: int
    w_dim: int
    num_ws: Optional[int]
    num_layers: int = 8
    embed_features: Optional[int] = None
    layer_features: Optional[int] = None
    activation: str = "lrelu"
    lr_multiplier: float = 0.01
    w_avg_beta: Optional[float] = 0.998

    @nn.compact
    def __call__(
        self,
        z: Optional[jax.Array],
        c: Optional[jax.Array],
        truncation_psi: float = 1.0,
        truncation_cutoff: Optional[int] = None,
        update_emas: bool = False,
    ) -> jax.Array:
        embed_features = self.embed_features if self.embed_features is not None else self.w_dim
        if self.c_dim == 0:
            embed_features = 0
        layer_features = self.layer_features if self.layer_features is not None else self.w_dim

        x = None
        if self.z_dim > 0:
            assert z is not None and z.shape[-1] == self.z_dim
            x = normalize_2nd_moment(z.astype(high()))
        if self.c_dim > 0:
            assert c is not None and c.shape[-1] == self.c_dim
            y = FullyConnected(embed_features, name="embed")(c.astype(high()))
            y = normalize_2nd_moment(y)
            x = jnp.concatenate([x, y], axis=-1) if x is not None else y

        features_list = [self.z_dim + embed_features] + [layer_features] * (self.num_layers - 1) + [self.w_dim]
        for idx in range(self.num_layers):
            x = FullyConnected(
                features_list[idx + 1], activation=self.activation,
                lr_multiplier=self.lr_multiplier, name=f"fc{idx}",
            )(x)

        track = self.num_ws is not None and self.w_avg_beta is not None
        if track:
            w_avg = self.variable("emas", "w_avg", jnp.zeros, (self.w_dim,), high())
            if update_emas and not self.is_initializing():
                mean_w = jax.lax.stop_gradient(jnp.mean(x, axis=0))
                w_avg.value = mean_w + (w_avg.value - mean_w) * self.w_avg_beta

        if self.num_ws is not None:
            x = jnp.repeat(x[:, None, :], self.num_ws, axis=1)

        if truncation_psi != 1:
            assert track
            avg = w_avg.value
            if self.num_ws is None or truncation_cutoff is None:
                x = avg + (x - avg) * truncation_psi
            else:
                trunc = avg + (x[:, :truncation_cutoff] - avg) * truncation_psi
                x = jnp.concatenate([trunc, x[:, truncation_cutoff:]], axis=1)
        return x


class SynthesisLayer(nn.Module):
    """Modulated conv + noise + bias_act (reference ``:274-333``)."""

    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = 256.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        w: jax.Array,
        noise_mode: str = "random",
        gain: float = 1.0,
        fused_modconv: bool = False,
        sample_idx: Optional[jax.Array] = None,
    ) -> jax.Array:
        assert noise_mode in ("random", "const", "none")
        in_channels = x.shape[-1]
        styles = FullyConnected(in_channels, bias_init=1.0, name="affine")(w.astype(high()))
        weight = self.param(
            "weight", nn.initializers.normal(1.0),
            (self.kernel_size, self.kernel_size, in_channels, self.out_channels), high(),
        )

        noise = None
        if self.use_noise:
            strength = self.param("noise_strength", nn.initializers.zeros, (), high())
            noise_const = self.variable(
                "noise_consts", "noise_const",
                lambda: jax.random.normal(self.make_rng("params"), (self.resolution, self.resolution), high()),
            )
            if noise_mode == "random":
                key = self.make_rng("noise")
                if sample_idx is not None:
                    # Mesh-size-invariant draw: key each row's noise plane by
                    # its GLOBAL sample index (the layer key is already
                    # path-unique per flax's rng folding), so 1-dev and N-dev
                    # runs of the same global batch see identical noise —
                    # lets the numeric invariance check run the production
                    # noise_mode (tests/test_train_step.py).
                    noise = jax.vmap(lambda i: jax.random.normal(
                        jax.random.fold_in(key, i),
                        (self.resolution, self.resolution, 1), high(),
                    ))(sample_idx) * strength
                else:
                    noise = jax.random.normal(
                        key, (x.shape[0], self.resolution, self.resolution, 1), high()
                    ) * strength
            elif noise_mode == "const":
                noise = (noise_const.value * strength)[None, :, :, None]

        f = setup_filter(list(self.resample_filter)) if self.up > 1 else None
        x = modulated_conv2d(
            x, weight.astype(x.dtype), styles, noise=noise, up=self.up,
            padding=self.kernel_size // 2, resample_filter=f,
            flip_weight=(self.up == 1), fused_modconv=fused_modconv,
        )

        b = self.param("bias", nn.initializers.zeros, (self.out_channels,), high())
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b, act=self.activation, gain=act_gain, clamp=act_clamp)


class ToRGBLayer(nn.Module):
    """1×1 modulated conv (no demod) to image channels (reference ``:338-358``)."""

    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_clamp: Optional[float] = 256.0

    @nn.compact
    def __call__(self, x: jax.Array, w: jax.Array, fused_modconv: bool = False) -> jax.Array:
        in_channels = x.shape[-1]
        styles = FullyConnected(in_channels, bias_init=1.0, name="affine")(w.astype(high()))
        weight_gain = 1.0 / np.sqrt(in_channels * self.kernel_size**2)
        styles = styles * weight_gain
        weight = self.param(
            "weight", nn.initializers.normal(1.0),
            (self.kernel_size, self.kernel_size, in_channels, self.out_channels), high(),
        )
        x = modulated_conv2d(
            x, weight.astype(x.dtype), styles, demodulate=False, fused_modconv=fused_modconv
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,), high())
        return bias_act(x, b, clamp=self.conv_clamp)


class SynthesisBlock(nn.Module):
    """One resolution level of G (reference ``:363-462``), skip/resnet/orig."""

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    is_last: bool
    architecture: str = "skip"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = 256.0
    use_bf16: bool = False
    layer_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @property
    def num_conv(self) -> int:
        return 1 if self.in_channels == 0 else 2

    @property
    def num_torgb(self) -> int:
        return 1 if (self.is_last or self.architecture == "skip") else 0

    @nn.compact
    def __call__(
        self,
        x: Optional[jax.Array],
        img: Optional[jax.Array],
        ws: jax.Array,
        force_fp32: bool = False,
        fused_modconv: bool = False,
        noise_mode: str = "random",
        sample_idx: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        assert self.architecture in ("orig", "skip", "resnet")
        assert ws.shape[1] == self.num_conv + self.num_torgb
        dtype = jnp.bfloat16 if (self.use_bf16 and not force_fp32) else high()
        w_iter = iter([ws[:, i] for i in range(ws.shape[1])])
        common = dict(
            w_dim=self.w_dim, resolution=self.resolution,
            resample_filter=self.resample_filter, conv_clamp=self.conv_clamp,
            **self.layer_kwargs,
        )

        if self.in_channels == 0:
            const = self.param(
                "const", nn.initializers.normal(1.0),
                (self.resolution, self.resolution, self.out_channels), high(),
            )
            x = jnp.broadcast_to(
                const.astype(dtype)[None], (ws.shape[0], *const.shape)
            )
        else:
            x = x.astype(dtype)

        if self.in_channels == 0:
            x = SynthesisLayer(self.out_channels, name="conv1", **common)(
                x, next(w_iter), noise_mode=noise_mode, fused_modconv=fused_modconv,
                sample_idx=sample_idx,
            )
        elif self.architecture == "resnet":
            y = Conv2dLayer(
                self.out_channels, kernel_size=1, use_bias=False, up=2,
                resample_filter=self.resample_filter, name="skip",
            )(x, gain=np.sqrt(0.5))
            x = SynthesisLayer(self.out_channels, up=2, name="conv0", **common)(
                x, next(w_iter), noise_mode=noise_mode, fused_modconv=fused_modconv,
                sample_idx=sample_idx,
            )
            x = SynthesisLayer(self.out_channels, name="conv1", **common)(
                x, next(w_iter), noise_mode=noise_mode, gain=np.sqrt(0.5),
                fused_modconv=fused_modconv, sample_idx=sample_idx,
            )
            x = y + x
        else:
            x = SynthesisLayer(self.out_channels, up=2, name="conv0", **common)(
                x, next(w_iter), noise_mode=noise_mode, fused_modconv=fused_modconv,
                sample_idx=sample_idx,
            )
            x = SynthesisLayer(self.out_channels, name="conv1", **common)(
                x, next(w_iter), noise_mode=noise_mode, fused_modconv=fused_modconv,
                sample_idx=sample_idx,
            )

        if img is not None:
            img = upsample2d(img, setup_filter(list(self.resample_filter)))
        if self.is_last or self.architecture == "skip":
            y = ToRGBLayer(
                self.img_channels, w_dim=self.w_dim, conv_clamp=self.conv_clamp, name="torgb"
            )(x, next(w_iter), fused_modconv=fused_modconv)
            y = y.astype(high())
            img = img + y if img is not None else y

        assert x.dtype == dtype
        assert img is None or img.dtype == high()
        return x, img


def _channels_dict(resolutions, channel_base, channel_max):
    return {res: min(channel_base // res, channel_max) for res in resolutions}


class SynthesisNetwork(nn.Module):
    """Stack of synthesis blocks 4² → img_resolution (reference ``:467-521``)."""

    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 4  # name kept for config parity; implemented as bf16
    architecture: str = "skip"
    conv_clamp: Optional[float] = 256.0
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    layer_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @property
    def block_resolutions(self):
        log2 = int(np.log2(self.img_resolution))
        assert self.img_resolution == 2**log2 and self.img_resolution >= 4
        return [2**i for i in range(2, log2 + 1)]

    @property
    def num_ws(self) -> int:
        n = 0
        for res in self.block_resolutions:
            n += 1 if res == 4 else 2
        return n + 1  # + torgb of the last block (earlier torgbs reuse next block's w)

    @nn.compact
    def __call__(self, ws: jax.Array, update_emas: bool = False, **block_kwargs) -> jax.Array:
        del update_emas  # SG2 synthesis has no EMAs (parity with reference signature)
        assert ws.shape[1] == self.num_ws and ws.shape[2] == self.w_dim
        ws = ws.astype(high())
        resolutions = self.block_resolutions
        channels = _channels_dict(resolutions, self.channel_base, self.channel_max)
        fp16_resolution = max(2 ** (int(np.log2(self.img_resolution)) + 1 - self.num_fp16_res), 8)

        x = img = None
        w_idx = 0
        for res in resolutions:
            in_ch = channels[res // 2] if res > 4 else 0
            block = SynthesisBlock(
                in_channels=in_ch,
                out_channels=channels[res],
                w_dim=self.w_dim,
                resolution=res,
                img_channels=self.img_channels,
                is_last=(res == self.img_resolution),
                architecture=self.architecture,
                resample_filter=self.resample_filter,
                conv_clamp=self.conv_clamp,
                use_bf16=(res >= fp16_resolution),
                layer_kwargs=dict(self.layer_kwargs),
                name=f"b{res}",
            )
            n_ws = block.num_conv + block.num_torgb
            x, img = block(x, img, ws[:, w_idx : w_idx + n_ws], **block_kwargs)
            w_idx += block.num_conv
        return img


class Generator(nn.Module):
    """mapping ∘ synthesis (reference ``:526-550``)."""

    z_dim: int
    c_dim: int
    w_dim: int
    img_resolution: int
    img_channels: int
    mapping_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)
    synthesis_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def setup(self):
        self.synthesis = SynthesisNetwork(
            w_dim=self.w_dim,
            img_resolution=self.img_resolution,
            img_channels=self.img_channels,
            **self.synthesis_kwargs,
        )
        self.mapping = MappingNetwork(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim,
            num_ws=self.synthesis.num_ws, **self.mapping_kwargs,
        )

    @property
    def num_ws(self) -> int:
        return SynthesisNetwork(
            w_dim=self.w_dim, img_resolution=self.img_resolution,
            img_channels=self.img_channels, **self.synthesis_kwargs,
        ).num_ws

    def __call__(
        self,
        z: jax.Array,
        c: Optional[jax.Array] = None,
        truncation_psi: float = 1.0,
        truncation_cutoff: Optional[int] = None,
        update_emas: bool = False,
        **synthesis_kwargs,
    ) -> jax.Array:
        ws = self.mapping(
            z, c, truncation_psi=truncation_psi,
            truncation_cutoff=truncation_cutoff, update_emas=update_emas,
        )
        return self.synthesis(ws, **synthesis_kwargs)

    def map_then_synthesize(self, ws, **synthesis_kwargs):
        """Direct synthesis from externally supplied ws (projector, mixing)."""
        return self.synthesis(ws, **synthesis_kwargs)


class DiscriminatorBlock(nn.Module):
    """One resolution level of D (reference ``:555-639``)."""

    in_channels: int
    tmp_channels: int
    out_channels: int
    resolution: int
    img_channels: int
    architecture: str = "resnet"
    activation: str = "lrelu"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = 256.0
    use_bf16: bool = False

    @nn.compact
    def __call__(
        self, x: Optional[jax.Array], img: Optional[jax.Array], force_fp32: bool = False
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        assert self.architecture in ("orig", "skip", "resnet")
        dtype = jnp.bfloat16 if (self.use_bf16 and not force_fp32) else high()
        if x is not None:
            x = x.astype(dtype)

        if self.in_channels == 0 or self.architecture == "skip":
            img = img.astype(dtype)
            y = Conv2dLayer(
                self.tmp_channels, kernel_size=1, activation=self.activation,
                conv_clamp=self.conv_clamp, name="fromrgb",
            )(img)
            x = x + y if x is not None else y
            img = (
                downsample2d(img, setup_filter(list(self.resample_filter)))
                if self.architecture == "skip" else None
            )

        if self.architecture == "resnet":
            y = Conv2dLayer(
                self.out_channels, kernel_size=1, use_bias=False, down=2,
                resample_filter=self.resample_filter, name="skip",
            )(x, gain=np.sqrt(0.5))
            x = Conv2dLayer(
                self.tmp_channels, kernel_size=3, activation=self.activation,
                conv_clamp=self.conv_clamp, name="conv0",
            )(x)
            x = Conv2dLayer(
                self.out_channels, kernel_size=3, activation=self.activation, down=2,
                resample_filter=self.resample_filter, conv_clamp=self.conv_clamp, name="conv1",
            )(x, gain=np.sqrt(0.5))
            x = y + x
        else:
            x = Conv2dLayer(
                self.tmp_channels, kernel_size=3, activation=self.activation,
                conv_clamp=self.conv_clamp, name="conv0",
            )(x)
            x = Conv2dLayer(
                self.out_channels, kernel_size=3, activation=self.activation, down=2,
                resample_filter=self.resample_filter, conv_clamp=self.conv_clamp, name="conv1",
            )(x)
        assert x.dtype == dtype
        return x, img


def minibatch_stddev(x: jax.Array, group_size: Optional[int], num_channels: int = 1) -> jax.Array:
    """Append cross-sample stddev feature channels (reference ``:644-668``).

    NHWC variant.  Groups never cross device shards — under data
    parallelism each shard computes its own groups, matching the
    reference's per-GPU behaviour.
    """
    n, h, w, c = x.shape
    g = min(group_size, n) if group_size is not None else n
    assert n % g == 0, f"batch {n} not divisible by mbstd group {g}"
    f = num_channels
    cc = c // f
    y = x.reshape(g, n // g, h, w, f, cc).astype(high())
    y = y - jnp.mean(y, axis=0, keepdims=True)
    y = jnp.mean(jnp.square(y), axis=0)
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=(1, 2, 4))  # [n//g, F]
    # Sample s belongs to stat group s % (n//g) (strided split, matching the
    # reference's reshape(G, -1, ...) + y.repeat(G, ...) tiling).
    y = jnp.tile(y, (g, 1))[:, None, None, :]  # [N,1,1,F]
    y = jnp.broadcast_to(y, (n, h, w, f)).astype(x.dtype)
    return jnp.concatenate([x, y], axis=-1)


class DiscriminatorEpilogue(nn.Module):
    """mbstd → conv → fc → out (+ conditional projection) (reference ``:673-743``)."""

    in_channels: int
    cmap_dim: int
    resolution: int
    img_channels: int
    architecture: str = "resnet"
    mbstd_group_size: Optional[int] = 4
    mbstd_num_channels: int = 1
    activation: str = "lrelu"
    conv_clamp: Optional[float] = 256.0

    @nn.compact
    def __call__(
        self, x: jax.Array, img: Optional[jax.Array], cmap: Optional[jax.Array]
    ) -> jax.Array:
        x = x.astype(high())
        if self.architecture == "skip":
            x = x + Conv2dLayer(
                self.in_channels, kernel_size=1, activation=self.activation, name="fromrgb"
            )(img.astype(high()))
        if self.mbstd_num_channels > 0:
            x = minibatch_stddev(x, self.mbstd_group_size, self.mbstd_num_channels)
        x = Conv2dLayer(
            self.in_channels, kernel_size=3, activation=self.activation,
            conv_clamp=self.conv_clamp, name="conv",
        )(x)
        # NHWC flatten: channel-fastest ordering (differs from the
        # reference's NCHW flatten, a re-parameterisation of fc weights).
        x = FullyConnected(self.in_channels, activation=self.activation, name="fc")(
            x.reshape(x.shape[0], -1)
        )
        x = FullyConnected(1 if self.cmap_dim == 0 else self.cmap_dim, name="out")(x)
        if self.cmap_dim > 0:
            assert cmap is not None
            x = jnp.sum(x * cmap, axis=1, keepdims=True) / np.sqrt(self.cmap_dim)
        return x


class Discriminator(nn.Module):
    """Full D (reference ``:748-792``)."""

    c_dim: int
    img_resolution: int
    img_channels: int
    architecture: str = "resnet"
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 4
    conv_clamp: Optional[float] = 256.0
    cmap_dim: Optional[int] = None
    block_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)
    mapping_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)
    epilogue_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @property
    def block_resolutions(self):
        log2 = int(np.log2(self.img_resolution))
        return [2**i for i in range(log2, 2, -1)]

    @nn.compact
    def __call__(self, img: jax.Array, c: Optional[jax.Array] = None, **block_kwargs) -> jax.Array:
        resolutions = self.block_resolutions
        channels = _channels_dict(resolutions + [4], self.channel_base, self.channel_max)
        fp16_resolution = max(2 ** (int(np.log2(self.img_resolution)) + 1 - self.num_fp16_res), 8)
        cmap_dim = self.cmap_dim if self.cmap_dim is not None else channels[4]
        if self.c_dim == 0:
            cmap_dim = 0

        x = None
        for res in resolutions:
            x, img = DiscriminatorBlock(
                in_channels=channels[res] if res < self.img_resolution else 0,
                tmp_channels=channels[res],
                out_channels=channels[res // 2],
                resolution=res,
                img_channels=self.img_channels,
                architecture=self.architecture,
                conv_clamp=self.conv_clamp,
                use_bf16=(res >= fp16_resolution),
                name=f"b{res}",
                **self.block_kwargs,
            )(x, img, **block_kwargs)

        cmap = None
        if self.c_dim > 0:
            cmap = MappingNetwork(
                z_dim=0, c_dim=self.c_dim, w_dim=cmap_dim, num_ws=None,
                w_avg_beta=None, name="mapping", **self.mapping_kwargs,
            )(None, c)
        return DiscriminatorEpilogue(
            in_channels=channels[4], cmap_dim=cmap_dim, resolution=4,
            img_channels=self.img_channels,
            architecture=self.architecture, conv_clamp=self.conv_clamp,
            name="b4", **self.epilogue_kwargs,
        )(x, img, cmap)


def discriminator_freeze_mask(
    params, freeze_layers: int, block_resolutions, architecture: str = "resnet"
) -> Any:
    """Freeze-D: mask pytree for ``optax.masked`` marking the first
    ``freeze_layers`` D layers (top resolution inward) as frozen.

    Mirrors the reference's ``first_layer_idx``/``trainable_gen`` counting
    (``networks_stylegan2.py:583-604``): per block, layers are counted in
    construction order [fromrgb?, conv0, conv1, skip?].  Returns a pytree
    of bools (True = trainable) shaped like ``params``.
    """
    import flax

    layer_idx = {}
    cur = 0
    for i, res in enumerate(block_resolutions):
        names = []
        if i == 0 or architecture == "skip":
            names.append("fromrgb")
        names += ["conv0", "conv1"]
        if architecture == "resnet":
            names.append("skip")
        for name in names:
            layer_idx[(f"b{res}", name)] = cur
            cur += 1
    flat = flax.traverse_util.flatten_dict(params)
    mask = {}
    for path in flat:
        top = path[0] if len(path) > 0 else ""
        second = path[1] if len(path) > 1 else ""
        idx = layer_idx.get((top, second))
        frozen = idx is not None and idx < freeze_layers
        mask[path] = not frozen
    return flax.traverse_util.unflatten_dict(mask)
