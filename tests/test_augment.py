"""ADA augmentation pipeline parity vs the reference AugmentPipe.

Uses ``debug_percentile`` (the reference's deterministic mode) so both
implementations apply identical transform magnitudes; checks the full
blit+geom medical config and the color/filter/corruption sections.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantrack_tpu.training.augment import (
    AugmentConfig,
    AugmentPipe,
    compute_static_margin,
    medical_augment_config,
)
from conftest import has_reference, import_reference_module

requires_reference = pytest.mark.skipif(not has_reference(), reason="reference tree not present")


def _ref_pipe(**kwargs):
    import torch

    aug_mod = import_reference_module("training.augment_mi")
    return aug_mod.AugmentPipe(run_dir="/tmp", batch_size=4, **kwargs)


def _run_ref(pipe, x_nhwc, dp):
    import torch

    x = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        y = pipe(x, allow_aug_debug_print=False, debug_percentile=dp)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


@requires_reference
@pytest.mark.parametrize("dp", [0.1, 0.35, 0.62, 0.9])
def test_geometric_medical_config_matches_reference(dp):
    cfg_kwargs = dict(
        xflip=1, xint=1, xint_max=0.05, scale=1, rotate=1, rotate_max=3 / 360,
        aniso=1, xfrac=1, scale_std=0.05, aniso_std=0.05, xfrac_std=0.05,
    )
    ref = _ref_pipe(**cfg_kwargs)
    ours = AugmentPipe(AugmentConfig(**cfg_kwargs), 32, 32, 1, compute_dtype=jnp.float32)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 32, 32, 1)).astype(np.float32)
    want = _run_ref(ref, x, dp)
    got = ours(jnp.asarray(x), jnp.asarray(1.0), jax.random.PRNGKey(0), debug_percentile=dp)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)


@requires_reference
@pytest.mark.parametrize("dp", [0.2, 0.75])
def test_color_sections_match_reference_3ch(dp):
    cfg_kwargs = dict(brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1)
    ref = _ref_pipe(**cfg_kwargs)
    ours = AugmentPipe(AugmentConfig(**cfg_kwargs), 16, 16, 3, compute_dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
    want = _run_ref(ref, x, dp)
    got = ours(jnp.asarray(x), jnp.asarray(1.0), jax.random.PRNGKey(0), debug_percentile=dp)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


@requires_reference
@pytest.mark.parametrize("dp", [0.3, 0.8])
def test_color_1ch_matches_reference(dp):
    cfg_kwargs = dict(brightness=1, contrast=1, lumaflip=1)
    ref = _ref_pipe(**cfg_kwargs)
    ours = AugmentPipe(AugmentConfig(**cfg_kwargs), 16, 16, 1, compute_dtype=jnp.float32)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 16, 16, 1)).astype(np.float32)
    want = _run_ref(ref, x, dp)
    got = ours(jnp.asarray(x), jnp.asarray(1.0), jax.random.PRNGKey(0), debug_percentile=dp)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


@requires_reference
@pytest.mark.parametrize("dp", [0.25, 0.7])
def test_imgfilter_matches_reference(dp):
    cfg_kwargs = dict(imgfilter=1)
    ref = _ref_pipe(**cfg_kwargs)
    # 64²: the filter-bank halo (taps//2) exceeds a 16² reflect pad.
    ours = AugmentPipe(AugmentConfig(imgfilter=1), 64, 64, 1, compute_dtype=jnp.float32)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 64, 64, 1)).astype(np.float32)
    want = _run_ref(ref, x, dp)
    got = ours(jnp.asarray(x), jnp.asarray(1.0), jax.random.PRNGKey(0), debug_percentile=dp)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


@requires_reference
def test_cutout_matches_reference():
    cfg_kwargs = dict(cutout=1)
    ref = _ref_pipe(**cfg_kwargs)
    ours = AugmentPipe(AugmentConfig(cutout=1), 16, 16, 1, compute_dtype=jnp.float32)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 16, 16, 1)).astype(np.float32)
    want = _run_ref(ref, x, 0.4)
    got = ours(jnp.asarray(x), jnp.asarray(1.0), jax.random.PRNGKey(0), debug_percentile=0.4)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_p_zero_is_identity_for_gated_augs():
    """With p=0 every augmentation must gate to identity (no geometric
    section runs identity-exact because the warp chain is exact only in
    the interior; use color/corruption sections)."""
    ours = AugmentPipe(AugmentConfig(brightness=1, contrast=1, noise=1, cutout=1), 16, 16, 1, compute_dtype=jnp.float32)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((4, 16, 16, 1)).astype(np.float32)
    got = ours(jnp.asarray(x), jnp.asarray(0.0), jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(got), x, rtol=1e-5, atol=1e-6)


def test_static_margin_reasonable():
    cfg = medical_augment_config()
    m = compute_static_margin(cfg, 256, 256)
    assert all(0 <= v <= 255 for v in m)
    # medical magnitudes are small: margin should be far below the 255 worst case
    assert max(m) <= 96


def test_augment_is_differentiable():
    ours = AugmentPipe(medical_augment_config(), 16, 16, 1, compute_dtype=jnp.float32)
    x = jnp.ones((2, 16, 16, 1))

    def f(x):
        return jnp.sum(ours(x, jnp.asarray(0.5), jax.random.PRNGKey(1)) ** 2)

    g = jax.grad(f)(x)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_warp_window_clip_probability_guard():
    from gantrack_tpu.training.augment import (
        compute_warp_window, warp_window_clip_probability, medical_augment_config,
    )

    cfg = medical_augment_config()
    window = compute_warp_window(cfg, 256, 256)
    # The window was computed from this config's MC maxima: ~never clips.
    p_ok = warp_window_clip_probability(cfg, 256, 256, window, samples=20000)
    assert p_ok < 1e-3, p_ok
    # A much larger rotation range under the same window must be flagged.
    import dataclasses
    big = dataclasses.replace(cfg, rotate=1.0, rotate_max=1.0, scale_std=0.4)
    p_bad = warp_window_clip_probability(big, 256, 256, window, samples=20000)
    assert p_bad > 0.01, p_bad
