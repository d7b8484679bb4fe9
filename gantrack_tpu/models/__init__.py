"""Model families: StyleGAN2(-ADA), StyleGAN3, CycleGAN/pix2pix, metric CNNs."""

from .stylegan2 import (
    Conv2dLayer,
    Discriminator,
    FullyConnected,
    Generator,
    MappingNetwork,
    SynthesisNetwork,
    discriminator_freeze_mask,
    minibatch_stddev,
)

__all__ = [
    "Conv2dLayer",
    "Discriminator",
    "FullyConnected",
    "Generator",
    "MappingNetwork",
    "SynthesisNetwork",
    "discriminator_freeze_mask",
    "minibatch_stddev",
]
