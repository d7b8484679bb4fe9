"""Fused upsample+warp kernel (interpret mode) vs the unfused composition
``affine_warp(upsample2d(x, f, up=2))`` — forward, gradient, and the
augment-pipe integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantrack_tpu.ops.pallas.upwarp import up_affine_warp
from gantrack_tpu.ops.pallas.warp import affine_warp
from gantrack_tpu.ops.upfirdn2d import setup_filter, upsample2d
from gantrack_tpu.training.augment import WAVELETS

WINDOW = (40, 384)


def _fir():
    return np.asarray(setup_filter(WAVELETS["sym6"]), np.float32)


def _thetas(n, kind="mix"):
    ms = []
    rng = np.random.default_rng(3)
    for i in range(n):
        if kind == "identity":
            a, s, tx, ty = 0.0, 1.0, 0.0, 0.0
        else:
            a = rng.uniform(-0.12, 0.12)
            s = rng.uniform(0.9, 1.1)
            tx, ty = rng.uniform(-0.05, 0.05, 2)
        ms.append([[np.cos(a) / s, -np.sin(a), tx], [np.sin(a), np.cos(a) / s, ty]])
    return jnp.asarray(np.asarray(ms, np.float32))


def _oracle(x, theta, out_h, out_w):
    up = upsample2d(x, jnp.asarray(_fir()), up=2)
    return affine_warp(up, theta, out_h, out_w, window=WINDOW, interpret=True)


@pytest.mark.parametrize("kind", ["identity", "mix"])
def test_upwarp_matches_composition(kind):
    rng = np.random.default_rng(0)
    n, h1, w1 = 3, 40, 44
    x = jnp.asarray(rng.standard_normal((n, h1, w1, 1)).astype(np.float32))
    theta = _thetas(n, kind)
    out_h, out_w = 2 * h1, 2 * w1
    want = _oracle(x, theta, out_h, out_w)
    got = up_affine_warp(x, theta, _fir(), out_h, out_w, WINDOW, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_upwarp_gradient_matches_composition():
    rng = np.random.default_rng(1)
    n, h1, w1 = 2, 32, 32
    x = jnp.asarray(rng.standard_normal((n, h1, w1, 1)).astype(np.float32))
    theta = _thetas(n)
    out_h = out_w = 2 * h1
    ct = jnp.asarray(rng.standard_normal((n, out_h, out_w, 1)).astype(np.float32))

    g_fused = jax.grad(lambda im: jnp.sum(
        up_affine_warp(im, theta, _fir(), out_h, out_w, WINDOW, interpret=True) * ct))(x)
    g_ref = jax.grad(lambda im: jnp.sum(
        _oracle(im, theta, out_h, out_w) * ct))(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.xfail(
    reason="Pallas interpret mode cannot nest kernel traces during grad-of-grad "
           "(same limitation as the plain warp suite); compiled mode works")
def test_upwarp_second_order_closes():
    """R1-style grad-of-grad resolves through the kernel pair."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 1)).astype(np.float32))
    theta = _thetas(1)

    def inner(im):
        y = up_affine_warp(im, theta, _fir(), 32, 32, WINDOW, interpret=True)
        g = jax.grad(lambda i2: jnp.sum(jnp.square(
            up_affine_warp(i2, theta, _fir(), 32, 32, WINDOW, interpret=True))))(im)
        return jnp.sum(jnp.square(g)) + jnp.sum(y)

    gg = jax.grad(inner)(x)
    assert np.isfinite(np.asarray(gg)).all()
