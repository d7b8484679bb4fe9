"""Pallas affine-warp kernel vs the gather grid_sample reference
(interpret mode on CPU; the real-TPU path shares the same kernel code)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantrack_tpu.ops.grid_sample import affine_grid, grid_sample
from gantrack_tpu.ops.pallas.warp import affine_warp, window_bounds_for


def _random_theta(n, rng, mag=0.05):
    theta = np.tile(np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32), (n, 1, 1))
    theta += rng.standard_normal((n, 2, 3)).astype(np.float32) * mag
    return jnp.asarray(theta)


@pytest.mark.parametrize("c", [1, 2])
def test_forward_matches_grid_sample(c):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 64, 72, c)).astype(np.float32))
    theta = _random_theta(2, rng)
    out_h, out_w = 48, 56
    want = grid_sample(img, affine_grid(theta, out_h, out_w))
    got = affine_warp(img, theta, out_h, out_w,
                      window=window_bounds_for(1.8, 0.2), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_backward_matches_grid_sample():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((2, 48, 64, 1)).astype(np.float32))
    theta = _random_theta(2, rng)
    win = window_bounds_for(1.8, 0.2)

    def loss_ref(x):
        return jnp.sum(jnp.sin(grid_sample(x, affine_grid(theta, 40, 48))))

    def loss_pal(x):
        return jnp.sum(jnp.sin(affine_warp(x, theta, 40, 48, window=win, interpret=True)))

    g_ref = jax.grad(loss_ref)(img)
    g_pal = jax.grad(loss_pal)(img)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_flip_transform():
    """xflip (a = -1) must stay within window bounds and match."""
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.standard_normal((1, 32, 32, 1)).astype(np.float32))
    theta = jnp.asarray(np.array([[[-1.0, 0, 0], [0, 1.0, 0]]], np.float32))
    want = grid_sample(img, affine_grid(theta, 32, 32))
    got = affine_warp(img, theta, 32, 32, window=window_bounds_for(1.2, 0.05),
                      interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.xfail(
    reason="Pallas interpret mode cannot nest kernel traces during grad-of-grad "
    "(jax pallas_core grid_context assertion); the compiled TPU path supports it "
    "(exercised by the R1 phase in bench.py / training).",
    strict=False,
)
def test_double_backward_matches_grid_sample():
    """R1-style grad-of-grad through the warp (splat's VJP = warp)."""
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.standard_normal((1, 32, 40, 1)).astype(np.float32))
    theta = _random_theta(1, rng)
    win = window_bounds_for(1.5, 0.2)

    def make_r1(warp_fn):
        def r1(x):
            def dsum(xi):
                return jnp.sum(jnp.tanh(warp_fn(xi)))

            g = jax.grad(dsum)(x)
            return jnp.sum(jnp.square(g))

        return r1

    r1_ref = make_r1(lambda x: grid_sample(x, affine_grid(theta, 24, 32)))
    r1_pal = make_r1(lambda x: affine_warp(x, theta, 24, 32, window=win, interpret=True))
    gg_ref = jax.grad(r1_ref)(img)
    gg_pal = jax.grad(r1_pal)(img)
    np.testing.assert_allclose(np.asarray(gg_pal), np.asarray(gg_ref), rtol=1e-3, atol=1e-4)


def test_augment_pipe_pallas_interpret_matches_gather():
    from gantrack_tpu.training.augment import AugmentPipe, medical_augment_config

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 1)).astype(np.float32))
    k = jax.random.PRNGKey(0)
    cfg = medical_augment_config()
    a_g = AugmentPipe(cfg, 32, 32, 1, impl="gather", compute_dtype=jnp.float32)
    a_p = AugmentPipe(cfg, 32, 32, 1, impl="pallas-interpret", compute_dtype=jnp.float32)
    y_g = a_g(x, jnp.asarray(1.0), k, debug_percentile=0.3)
    y_p = a_p(x, jnp.asarray(1.0), k, debug_percentile=0.3)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_g), rtol=1e-4, atol=1e-4)
