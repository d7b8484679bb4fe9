"""Pallas implicit-GEMM conv3x3 vs lax.conv: forward, VJPs, grad-of-grad.

Interpret mode on CPU (tests/conftest.py forces the CPU platform); the
same code path compiles on TPU where it replaces XLA's spatial convs on
the SG2/SG3 3×3 stride-1 family.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantrack_tpu.ops.attic.conv3x3 import conv3x3, wgrad3x3, supported


def _ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


CASES = [
    (2, 16, 64, 64),
    (1, 16, 64, 128),
    (2, 8, 128, 64),
    (1, 32, 64, 64),
]


@pytest.mark.parametrize("n,h,ci,co", CASES)
def test_forward_matches_lax(n, h, ci, co):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = _rand(kx, (n, h, h, ci))
    w = _rand(kw, (3, 3, ci, co)) / np.sqrt(9 * ci)
    out = conv3x3(x, w, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(x, w)),
                               rtol=1e-4, atol=1e-4)


def test_supported_predicate():
    assert supported((32, 256, 256, 64), (3, 3, 64, 64), jnp.bfloat16)
    assert supported((32, 32, 32, 512), (3, 3, 512, 512), jnp.bfloat16)
    assert not supported((4, 4, 4, 513), (3, 3, 513, 512), jnp.float32)  # epilogue
    assert not supported((4, 16, 16, 64), (1, 1, 64, 64), jnp.float32)   # 1x1
    assert not supported((4, 16, 16, 48), (3, 3, 48, 64), jnp.float32)   # lanes
    assert not supported((2, 8, 8, 64), (3, 3, 64, 64), jnp.float32)    # folded width < 8
    assert supported((1, 8, 8, 512), (3, 3, 512, 512), jnp.bfloat16)
    assert supported((1, 8, 8, 512), (3, 3, 512, 512), jnp.float32)


def test_vjp_matches_lax():
    kx, kw, kg = jax.random.split(jax.random.PRNGKey(1), 3)
    x = _rand(kx, (2, 16, 16, 64))
    w = _rand(kw, (3, 3, 64, 64)) / 24.0
    g = _rand(kg, (2, 16, 16, 64))

    def f_ref(x, w):
        return jnp.sum(_ref(x, w) * g)

    def f_pl(x, w):
        return jnp.sum(conv3x3(x, w, True) * g)

    dx_r, dw_r = jax.grad(f_ref, argnums=(0, 1))(x, w)
    dx_p, dw_p = jax.grad(f_pl, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw_p), np.asarray(dw_r), rtol=1e-4, atol=1e-4)


def test_wgrad_direct():
    kx, kg = jax.random.split(jax.random.PRNGKey(2))
    x = _rand(kx, (2, 16, 16, 64))
    g = _rand(kg, (2, 16, 16, 128))
    dw = wgrad3x3(x, g, True)
    ref = jax.grad(lambda w: jnp.sum(_ref(x, w) * g))(jnp.zeros((3, 3, 64, 128)))
    np.testing.assert_allclose(np.asarray(dw), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_grad_of_grad_r1_style():
    """R1-style double backward: d/dw of ||d conv/d x||² must match XLA."""
    kx, kw = jax.random.split(jax.random.PRNGKey(3))
    x = _rand(kx, (1, 16, 16, 64))
    w = _rand(kw, (3, 3, 64, 64)) / 24.0

    def r1(conv):
        def inner(w_):
            gx = jax.grad(lambda x_: jnp.sum(jnp.tanh(conv(x_, w_))))(x)
            return jnp.sum(jnp.square(gx))
        return inner

    ref = jax.grad(r1(lambda a, b: _ref(a, b)))(w)
    got = jax.grad(r1(lambda a, b: conv3x3(a, b, True)))(w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_bf16_forward_close():
    kx, kw = jax.random.split(jax.random.PRNGKey(4))
    x = _rand(kx, (1, 16, 16, 64)).astype(jnp.bfloat16)
    w = (_rand(kw, (3, 3, 64, 64)) / 24.0).astype(jnp.bfloat16)
    out = conv3x3(x, w, True)
    assert out.dtype == jnp.bfloat16
    ref = _ref(x.astype(jnp.float32), w.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=0.05, atol=0.05)
