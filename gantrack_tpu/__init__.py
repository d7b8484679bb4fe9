"""gantrack_tpu — a TPU-native medical-image GAN framework.

Re-designed from scratch in JAX/XLA/Pallas with the capabilities of
ltronchin/Gan-track (StyleGAN2-ADA / StyleGAN3 training on CT/MR slices,
CycleGAN/pix2pix, volume preprocessing, FID/KID/PR/IS metrics, projection
and generation tools).  See SURVEY.md for the capability blueprint.

Layout conventions
------------------
* Images are **NHWC** (batch, height, width, channels) — channels ride the
  TPU lane dimension.  The reference uses NCHW; every public API here is
  NHWC and converters live in :mod:`gantrack_tpu.utils.image`.
* Convolution weights are **HWIO**.
* All randomness flows through explicit ``jax.random`` keys.
* Parameters live in plain pytrees managed by Flax modules; train state is
  a single dataclass checkpointed with orbax.
"""

__version__ = "0.1.0"
