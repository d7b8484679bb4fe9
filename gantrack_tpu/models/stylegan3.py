"""StyleGAN3 (alias-free) generator, TPU-native.

Capability parity with the reference ``training/networks_stylegan3.py``:
Fourier-feature ``SynthesisInput`` with learned rotation/translation,
critically-sampled layer schedule (geometric cutoff progression, Kaiser/
jinc low-pass design), filtered leaky-ReLU layers, magnitude-EMA input
gain, and the stylegan3-t / stylegan3-r configuration knobs
(``conv_kernel``, ``use_radial_filters``, channel doubling).

TPU-first notes:
* NHWC; modulated conv uses the unfused activation-scaling form (one
  shared-weight MXU conv; the reference's grouped conv, ``:60-64``, is
  CUDA-oriented).  The SG3 pre-normalisations (per-out-channel weight
  norm, whole-batch style norm, ``:41-43``) commute with that form.
* ``filtered_lrelu`` composes fused XLA convs (see ``ops/filtered_lrelu``).
* ``magnitude_ema`` lives in the flax ``emas`` collection; pass
  ``update_emas=True`` under ``mutable=['emas']`` during the D-main phase
  like the reference (``:344-349``).
* Low-pass filters are designed host-side at trace time (static consts).

The discriminator is shared with StyleGAN2 (reference
``train_mi_multimodal.py:236``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal
import scipy.special

from ..ops.filtered_lrelu import filtered_lrelu
from .stylegan2 import FullyConnected


def sg3_modulated_conv2d(
    x: jax.Array,          # [N, H, W, I]
    w: jax.Array,          # [kh, kw, I, O]
    s: jax.Array,          # [N, I]
    demodulate: bool = True,
    padding: int = 0,
    input_gain: Optional[jax.Array] = None,
) -> jax.Array:
    """Reference ``networks_stylegan3.py:25-64`` in unfused NHWC form."""
    w32 = w.astype(jnp.float32)
    s32 = s.astype(jnp.float32)
    if demodulate:
        w32 = w32 * jax.lax.rsqrt(jnp.mean(jnp.square(w32), axis=(0, 1, 2), keepdims=True))
        s32 = s32 * jax.lax.rsqrt(jnp.mean(jnp.square(s32)))

    dcoefs = None
    if demodulate:
        wv = w32[jnp.newaxis] * s32[:, None, None, :, None]  # [N,kh,kw,I,O]
        dcoefs = jax.lax.rsqrt(jnp.sum(jnp.square(wv), axis=(1, 2, 3)) + 1e-8)  # [N,O]

    s_eff = s32 if input_gain is None else s32 * jnp.broadcast_to(input_gain, s32.shape)
    x = x * s_eff[:, None, None, :].astype(x.dtype)
    x = jax.lax.conv_general_dilated(
        x, w32.astype(x.dtype), (1, 1),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if demodulate:
        x = x * dcoefs[:, None, None, :].astype(x.dtype)
    return x


def design_lowpass_filter(numtaps: int, cutoff: float, width: float, fs: float,
                          radial: bool = False) -> Optional[np.ndarray]:
    """Kaiser (separable) or jinc (radial) low-pass design (reference
    ``:368-385``)."""
    assert numtaps >= 1
    if numtaps == 1:
        return None
    if not radial:
        return scipy.signal.firwin(numtaps=numtaps, cutoff=cutoff, width=width, fs=fs).astype(np.float32)
    x = (np.arange(numtaps) - (numtaps - 1) / 2) / fs
    r = np.hypot(*np.meshgrid(x, x))
    with np.errstate(divide="ignore", invalid="ignore"):
        f = scipy.special.j1(2 * cutoff * (np.pi * r)) / (np.pi * r)
    f[np.isnan(f)] = cutoff * cutoff * np.pi  # r→0 limit of j1(2cπr)/(πr) = c²π... see note
    beta = scipy.signal.kaiser_beta(scipy.signal.kaiser_atten(numtaps, width / (fs / 2)))
    wnd = np.kaiser(numtaps, beta)
    f = f * np.outer(wnd, wnd)
    f = f / np.sum(f)
    return f.astype(np.float32)


class SynthesisInput(nn.Module):
    """Fourier-feature input with learned affine transform (reference
    ``:172-252``)."""

    w_dim: int
    channels: int
    size: int
    sampling_rate: float
    bandwidth: float

    @nn.compact
    def __call__(self, w: jax.Array) -> jax.Array:
        n = w.shape[0]

        def init_freqs(key):
            f = jax.random.normal(key, (self.channels, 2))
            radii = jnp.sqrt(jnp.sum(jnp.square(f), axis=1, keepdims=True))
            f = f / (radii * jnp.exp(jnp.square(radii)) ** 0.25)
            return f * self.bandwidth

        freqs = self.variable("consts", "freqs",
                              lambda: init_freqs(self.make_rng("params"))).value
        phases = self.variable(
            "consts", "phases",
            lambda: jax.random.uniform(self.make_rng("params"), (self.channels,)) - 0.5,
        ).value
        # User-specified inverse transform w.r.t. the output image
        # (drivable from gen tools for translation/rotation sweeps).
        transform = self.variable("consts", "transform", lambda: jnp.eye(3)).value

        weight = self.param("weight", nn.initializers.normal(1.0),
                            (self.channels, self.channels))

        # Learned rotation/translation: affine starts at identity
        # (weight_init=0, bias=[1,0,0,0]).
        t = FullyConnected(4, weight_init=0.0, bias_init=(1.0, 0.0, 0.0, 0.0),
                           name="affine")(w.astype(jnp.float32))
        t = t / jnp.linalg.norm(t[:, :2], axis=1, keepdims=True)
        zeros = jnp.zeros((n,))
        ones = jnp.ones((n,))
        m_r = jnp.stack([
            jnp.stack([t[:, 0], -t[:, 1], zeros], axis=-1),
            jnp.stack([t[:, 1], t[:, 0], zeros], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ], axis=1)
        m_t = jnp.stack([
            jnp.stack([ones, zeros, -t[:, 2]], axis=-1),
            jnp.stack([zeros, ones, -t[:, 3]], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ], axis=1)
        transforms = m_r @ m_t @ transform[jnp.newaxis]

        fr = freqs[jnp.newaxis]                                 # [1, C, 2]
        ph = phases[jnp.newaxis] + (fr @ transforms[:, :2, 2:])[..., 0]  # [N, C]
        fr = fr @ transforms[:, :2, :2]                         # [N, C, 2]

        # Dampen out-of-band frequencies introduced by the transform.
        amplitudes = jnp.clip(
            1 - (jnp.linalg.norm(fr, axis=2) - self.bandwidth)
            / (self.sampling_rate / 2 - self.bandwidth),
            0, 1,
        )

        # Sampling grid (align_corners=False pixel centres, scaled to the
        # sampling-rate coordinate frame).
        half = 0.5 * self.size / self.sampling_rate
        coords = (jnp.arange(self.size, dtype=jnp.float32) * 2 + 1) / self.size - 1
        gy, gx = jnp.meshgrid(coords * half, coords * half, indexing="ij")
        grid = jnp.stack([gx, gy], axis=-1)                      # [H, W, 2]

        x = jnp.einsum("hwi,nci->nhwc", grid, fr) + ph[:, None, None, :]
        x = jnp.sin(x * (np.pi * 2))
        x = x * amplitudes[:, None, None, :]
        x = jnp.einsum("nhwc,dc->nhwd", x, weight / np.sqrt(self.channels))
        return x  # [N, size, size, channels]


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    is_torgb: bool
    is_critically_sampled: bool
    use_bf16: bool
    in_channels: int
    out_channels: int
    in_size: int
    out_size: int
    in_sampling_rate: int
    out_sampling_rate: int
    in_cutoff: float
    out_cutoff: float
    in_half_width: float
    out_half_width: float


class SynthesisLayer(nn.Module):
    """Modulated conv → filtered lrelu at the layer's sampling rates
    (reference ``:255-365``)."""

    w_dim: int
    spec: LayerSpec
    conv_kernel: int = 3
    filter_size: int = 6
    lrelu_upsampling: int = 2
    use_radial_filters: bool = False
    conv_clamp: Optional[float] = 256.0
    magnitude_ema_beta: float = 0.999

    @nn.compact
    def __call__(self, x, w, update_emas: bool = False, force_fp32: bool = False):
        spec = self.spec
        kernel = 1 if spec.is_torgb else self.conv_kernel
        tmp_rate = max(spec.in_sampling_rate, spec.out_sampling_rate) * (
            1 if spec.is_torgb else self.lrelu_upsampling
        )
        up_factor = int(np.rint(tmp_rate / spec.in_sampling_rate))
        down_factor = int(np.rint(tmp_rate / spec.out_sampling_rate))
        up_taps = self.filter_size * up_factor if up_factor > 1 and not spec.is_torgb else 1
        down_taps = self.filter_size * down_factor if down_factor > 1 and not spec.is_torgb else 1
        down_radial = self.use_radial_filters and not spec.is_critically_sampled

        up_filter = design_lowpass_filter(
            up_taps, spec.in_cutoff, spec.in_half_width * 2, tmp_rate
        )
        down_filter = design_lowpass_filter(
            down_taps, spec.out_cutoff, spec.out_half_width * 2, tmp_rate, radial=down_radial
        )

        pad_total = (spec.out_size - 1) * down_factor + 1
        pad_total -= (spec.in_size + kernel - 1) * up_factor
        pad_total += up_taps + down_taps - 2
        pad_lo = (pad_total + up_factor) // 2
        pad_hi = pad_total - pad_lo

        # Magnitude EMA → input gain (reference ``:344-349``).
        magnitude_ema = self.variable("emas", "magnitude_ema", lambda: jnp.ones(()))
        if update_emas and not self.is_initializing():
            cur = jnp.mean(jnp.square(jax.lax.stop_gradient(x).astype(jnp.float32)))
            magnitude_ema.value = cur + (magnitude_ema.value - cur) * self.magnitude_ema_beta
        input_gain = jax.lax.rsqrt(magnitude_ema.value)

        styles = FullyConnected(spec.in_channels, bias_init=1.0, name="affine")(
            w.astype(jnp.float32)
        )
        if spec.is_torgb:
            styles = styles * (1 / np.sqrt(spec.in_channels * kernel**2))
        weight = self.param(
            "weight", nn.initializers.normal(1.0),
            (kernel, kernel, spec.in_channels, spec.out_channels),
        )
        bias = self.param("bias", nn.initializers.zeros, (spec.out_channels,))

        dtype = jnp.bfloat16 if (spec.use_bf16 and not force_fp32) else jnp.float32
        x = sg3_modulated_conv2d(
            x.astype(dtype), weight, styles, demodulate=not spec.is_torgb,
            padding=kernel - 1, input_gain=input_gain,
        )

        gain = 1.0 if spec.is_torgb else float(np.sqrt(2))
        slope = 1.0 if spec.is_torgb else 0.2
        fu = jnp.asarray(up_filter) if up_filter is not None else None
        fd = jnp.asarray(down_filter) if down_filter is not None else None
        x = filtered_lrelu(
            x, fu=fu, fd=fd, b=bias.astype(x.dtype),
            up=up_factor, down=down_factor,
            padding=[int(pad_lo), int(pad_hi), int(pad_lo), int(pad_hi)],
            gain=gain, slope=slope, clamp=self.conv_clamp,
        )
        assert x.shape[1] == spec.out_size and x.shape[2] == spec.out_size
        return x


class SynthesisNetwork(nn.Module):
    """Layer schedule per the alias-free paper (reference ``:399-466``)."""

    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    num_layers: int = 14
    num_critical: int = 2
    first_cutoff: float = 2.0
    first_stopband: float = 2**2.1
    last_stopband_rel: float = 2**0.3
    margin_size: int = 10
    output_scale: float = 0.25
    num_fp16_res: int = 4
    conv_kernel: int = 3
    use_radial_filters: bool = False

    @property
    def num_ws(self) -> int:
        return self.num_layers + 2

    def _schedule(self):
        last_cutoff = self.img_resolution / 2
        last_stopband = last_cutoff * self.last_stopband_rel
        exponents = np.minimum(
            np.arange(self.num_layers + 1) / (self.num_layers - self.num_critical), 1
        )
        cutoffs = self.first_cutoff * (last_cutoff / self.first_cutoff) ** exponents
        stopbands = self.first_stopband * (last_stopband / self.first_stopband) ** exponents
        sampling_rates = np.exp2(
            np.ceil(np.log2(np.minimum(stopbands * 2, self.img_resolution)))
        )
        half_widths = np.maximum(stopbands, sampling_rates / 2) - cutoffs
        sizes = (sampling_rates + self.margin_size * 2).astype(int)
        sizes[-2:] = self.img_resolution
        channels = np.rint(
            np.minimum((self.channel_base / 2) / cutoffs, self.channel_max)
        ).astype(int)
        channels[-1] = self.img_channels
        return cutoffs, sampling_rates.astype(int), half_widths, sizes, channels

    @nn.compact
    def __call__(self, ws: jax.Array, update_emas: bool = False,
                 force_fp32: bool = False, **_unused):
        assert ws.shape[1] == self.num_ws
        ws = ws.astype(jnp.float32)
        cutoffs, rates, half_widths, sizes, channels = self._schedule()

        x = SynthesisInput(
            w_dim=self.w_dim, channels=int(channels[0]), size=int(sizes[0]),
            sampling_rate=float(rates[0]), bandwidth=float(cutoffs[0]), name="input",
        )(ws[:, 0])

        for idx in range(self.num_layers + 1):
            prev = max(idx - 1, 0)
            spec = LayerSpec(
                is_torgb=(idx == self.num_layers),
                is_critically_sampled=(idx >= self.num_layers - self.num_critical),
                use_bf16=(rates[idx] * (2**self.num_fp16_res) > self.img_resolution),
                in_channels=int(channels[prev]), out_channels=int(channels[idx]),
                in_size=int(sizes[prev]), out_size=int(sizes[idx]),
                in_sampling_rate=int(rates[prev]), out_sampling_rate=int(rates[idx]),
                in_cutoff=float(cutoffs[prev]), out_cutoff=float(cutoffs[idx]),
                in_half_width=float(half_widths[prev]), out_half_width=float(half_widths[idx]),
            )
            x = SynthesisLayer(
                w_dim=self.w_dim, spec=spec,
                conv_kernel=self.conv_kernel,
                use_radial_filters=self.use_radial_filters,
                name=f"L{idx}_{spec.out_size}_{spec.out_channels}",
            )(x, ws[:, idx + 1], update_emas=update_emas, force_fp32=force_fp32)

        if self.output_scale != 1:
            x = x * self.output_scale
        return x.astype(jnp.float32)


class Generator(nn.Module):
    """mapping ∘ synthesis (reference ``:489-515``)."""

    z_dim: int
    c_dim: int
    w_dim: int
    img_resolution: int
    img_channels: int
    mapping_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)
    channel_base: int = 32768
    channel_max: int = 512
    conv_kernel: int = 3
    use_radial_filters: bool = False
    num_fp16_res: int = 4
    synthesis_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def setup(self):
        from .stylegan2 import MappingNetwork

        self.synthesis = SynthesisNetwork(
            w_dim=self.w_dim, img_resolution=self.img_resolution,
            img_channels=self.img_channels,
            channel_base=self.channel_base, channel_max=self.channel_max,
            conv_kernel=self.conv_kernel, use_radial_filters=self.use_radial_filters,
            num_fp16_res=self.num_fp16_res,
            **self.synthesis_kwargs,
        )
        mk = dict(self.mapping_kwargs)
        mk.setdefault("num_layers", 2)
        self.mapping = MappingNetwork(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim,
            num_ws=self.synthesis.num_ws, **mk,
        )

    def __call__(self, z, c=None, truncation_psi=1.0, truncation_cutoff=None,
                 update_emas=False, **synthesis_kwargs):
        synthesis_kwargs.pop("noise_mode", None)  # SG3 has no per-pixel noise
        ws = self.mapping(z, c, truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff, update_emas=update_emas)
        return self.synthesis(ws, update_emas=update_emas, **synthesis_kwargs)
