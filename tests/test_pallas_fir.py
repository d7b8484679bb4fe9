"""Pallas depthwise FIR kernel vs the upfirdn2d conv lowering.

Covers the three kernel forms (same / down2 / up2) on the exact
geometries the SG2 networks emit through ``conv2d_resample``
(reference ``torch_utils/ops/upfirdn2d.py`` numerics contract), plus
VJP closure (adjoint-of-adjoint) for the R1/PL double-backprop path.
Runs in interpret mode on CPU; the same kernels compile on the chip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantrack_tpu.ops.attic import fir as fir_mod
from gantrack_tpu.ops.upfirdn2d import setup_filter, upfirdn2d


@pytest.fixture(autouse=True)
def _interpret():
    fir_mod.INTERPRET = True
    yield
    fir_mod.INTERPRET = False


F4 = [1.0, 3.0, 3.0, 1.0]


def _ref(x, taps, up, down, padding, gain, flip):
    f = setup_filter(np.outer(taps, taps) / np.sum(taps) ** 0 , normalize=False)
    # upfirdn2d takes (padx0, padx1, pady0, pady1); fir2d takes y-first.
    py0, py1, px0, px1 = padding
    return upfirdn2d(x, jnp.asarray(np.outer(taps, taps), jnp.float32),
                     up=up, down=down, padding=[px0, px1, py0, py1],
                     gain=gain, flip_filter=flip, impl="conv")


@pytest.mark.parametrize(
    "shape,up,down,padding,gain,flip",
    [
        # G conv0 post-FIR: same-res, pad 0, gain 4 (conv2d_resample:133)
        ((2, 19, 19, 16), 1, 1, (0, 0, 0, 0), 4.0, False),
        # D conv1 pre-FIR: same-res, pad (2,2) (conv2d_resample:117)
        ((2, 16, 16, 16), 1, 1, (2, 2, 2, 2), 1.0, False),
        # flip + asymmetric pad (adjoint form)
        ((1, 12, 14, 8), 1, 1, (3, 1, 1, 3), 1.0, True),
        # D skip FIR: down2, pad (1,1) (conv2d_resample:107)
        ((2, 16, 16, 16), 1, 2, (1, 1, 1, 1), 1.0, False),
        ((1, 20, 24, 8), 1, 2, (2, 1, 1, 2), 1.0, False),
        # up2 (adjoint of down2; also upsample2d form with gain 4)
        ((2, 9, 9, 16), 2, 1, (2, 1, 2, 1), 4.0, False),
        ((1, 8, 12, 8), 2, 1, (1, 2, 2, 1), 1.0, True),
    ],
)
def test_fir2d_matches_upfirdn2d(shape, up, down, padding, gain, flip):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    got = fir_mod.fir2d(x, F4, F4, up=up, down=down, padding=padding,
                        gain=gain, flip=flip)
    ref = _ref(x, F4, up, down, padding, gain, flip)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize(
    "shape,up,down,padding",
    [
        ((1, 14, 14, 8), 1, 1, (0, 0, 0, 0)),
        ((1, 16, 16, 8), 1, 2, (1, 1, 1, 1)),
        ((1, 8, 8, 8), 2, 1, (2, 1, 2, 1)),
    ],
)
def test_fir2d_vjp_matches(shape, up, down, padding):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    kw = dict(up=up, down=down, padding=padding, gain=2.0, flip=False)
    ref_fn = lambda v: _ref(v, F4, up, down, padding, 2.0, False)
    got_fn = lambda v: fir_mod.fir2d(v, F4, F4, **kw)
    ct = jnp.asarray(rng.standard_normal(ref_fn(x).shape).astype(np.float32))
    g_ref = jax.grad(lambda v: jnp.vdot(ref_fn(v), ct))(x)
    g_got = jax.grad(lambda v: jnp.vdot(got_fn(v), ct))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)
    # second order (R1/PL double backprop closes over the adjoint set)
    h_ref = jax.grad(lambda v: jnp.sum(jax.grad(
        lambda u: jnp.sum(ref_fn(u) ** 2))(v) ** 2))(x)
    h_got = jax.grad(lambda v: jnp.sum(jax.grad(
        lambda u: jnp.sum(got_fn(u) ** 2))(v) ** 2))(x)
    np.testing.assert_allclose(np.asarray(h_got), np.asarray(h_ref),
                               atol=2e-3, rtol=2e-3)


def test_fir2d_bf16_f32_accumulation():
    rng = np.random.default_rng(2)
    x32 = rng.standard_normal((1, 16, 16, 8)).astype(np.float32)
    x = jnp.asarray(x32, jnp.bfloat16)
    got = fir_mod.fir2d(x, F4, F4, padding=(2, 1, 1, 2), gain=1.0)
    assert got.dtype == jnp.bfloat16
    ref = _ref(jnp.asarray(x32, jnp.bfloat16), F4, 1, 1, (2, 1, 1, 2), 1.0, False)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)


@pytest.mark.parametrize(
    "up,down,padding,gain,flip",
    [
        (1, 1, (0, 0, 0, 0), 4.0, False),
        (1, 2, (1, 1, 1, 1), 1.0, False),
        (2, 1, (3, 1, 3, 1), 4.0, False),
        (1, 1, (2, 2, 2, 2), 1.0, True),
    ],
)
def test_fir2d_setup_filter_taps(up, down, padding, gain, flip):
    """fir2d fed the normalized setup_filter taps == the conv lowering
    (the exact filter every network resample uses)."""
    f = setup_filter([1, 3, 3, 1])  # normalized 2-D outer product
    taps = tuple((np.asarray([1, 3, 3, 1], np.float32) / 8.0).tolist())
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
    py0, py1, px0, px1 = padding
    ref = upfirdn2d(x, f, up=up, down=down, padding=[px0, px1, py0, py1],
                    gain=gain, flip_filter=flip, impl="conv")
    got = fir_mod.fir2d(x, taps, taps, up=up, down=down,
                        padding=padding, gain=gain, flip=flip)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
