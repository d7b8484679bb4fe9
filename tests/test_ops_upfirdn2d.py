"""upfirdn2d / filter2d / upsample2d / downsample2d numerics.

Cross-checked against the reference's pure-PyTorch ``_upfirdn2d_ref``
oracle (``torch_utils/ops/upfirdn2d.py:167-211``) when available, plus
self-contained golden properties (shapes, DC gain, gradients).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantrack_tpu.ops import (
    downsample2d,
    filter2d,
    setup_filter,
    upfirdn2d,
    upsample2d,
)
from conftest import has_reference, import_reference_module

requires_reference = pytest.mark.skipif(not has_reference(), reason="reference tree not present")


def _rand_nhwc(rng, n=2, h=8, w=9, c=3):
    return rng.standard_normal((n, h, w, c)).astype(np.float32)


def _to_torch_nchw(x):
    import torch

    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _from_torch_nchw(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


CASES = [
    # (up, down, padding, filter_taps, flip, gain)
    (1, 1, 0, [1, 3, 3, 1], False, 1),
    (2, 1, [1, 1], [1, 3, 3, 1], False, 4),
    (1, 2, [2, 1, 1, 2], [1, 3, 3, 1], False, 1),
    (2, 2, 2, [1, 2, 1], True, 1),
    (1, 1, [-1, 2, 0, -1], [1, 3, 3, 1], False, 2),
    ((2, 1), (1, 2), [3, 1, 0, 2], [1, 3, 3, 1], False, 1),
    (1, 1, 1, None, False, 1),
    (4, 2, 3, [1, 4, 6, 4, 1], False, 1),
]


@requires_reference
@pytest.mark.parametrize("up,down,padding,taps,flip,gain", CASES)
def test_upfirdn2d_matches_reference(up, down, padding, taps, flip, gain):
    torch = pytest.importorskip("torch")
    ref = import_reference_module("torch_utils.ops.upfirdn2d")

    rng = np.random.default_rng(0)
    x = _rand_nhwc(rng)
    if taps is None:
        f_np = None
        f_t = None
        f_j = None
    else:
        f_np = np.asarray(taps, dtype=np.float32)
        f_np = f_np / f_np.sum() if f_np.ndim == 1 else f_np
        f_t = torch.from_numpy(f_np.copy())
        f_j = jnp.asarray(f_np)

    want = ref._upfirdn2d_ref(
        _to_torch_nchw(x), f_t, up=up, down=down, padding=padding,
        flip_filter=flip, gain=gain,
    )
    got = upfirdn2d(jnp.asarray(x), f_j, up=up, down=down, padding=padding,
                    flip_filter=flip, gain=gain)
    np.testing.assert_allclose(np.asarray(got), _from_torch_nchw(want), rtol=1e-5, atol=1e-5)


@requires_reference
def test_upfirdn2d_separable_matches_reference():
    torch = pytest.importorskip("torch")
    ref = import_reference_module("torch_utils.ops.upfirdn2d")
    rng = np.random.default_rng(1)
    x = _rand_nhwc(rng, h=12, w=10)
    taps = np.asarray([1, 3, 5, 8, 8, 5, 3, 1], dtype=np.float32)
    taps /= taps.sum()
    want = ref._upfirdn2d_ref(_to_torch_nchw(x), torch.from_numpy(taps.copy()),
                              up=2, down=1, padding=3, gain=4)
    got = upfirdn2d(jnp.asarray(x), jnp.asarray(taps), up=2, down=1, padding=3, gain=4)
    np.testing.assert_allclose(np.asarray(got), _from_torch_nchw(want), rtol=1e-5, atol=1e-5)


@requires_reference
@pytest.mark.parametrize("helper", ["filter2d", "upsample2d", "downsample2d"])
def test_helpers_match_reference(helper):
    torch = pytest.importorskip("torch")
    ref = import_reference_module("torch_utils.ops.upfirdn2d")
    rng = np.random.default_rng(2)
    x = _rand_nhwc(rng, h=8, w=8)
    f_t = ref.setup_filter([1, 3, 3, 1])
    f_j = setup_filter([1, 3, 3, 1])
    np.testing.assert_allclose(np.asarray(f_j), f_t.numpy(), rtol=1e-6, atol=1e-7)

    ref_fn = getattr(ref, helper)
    ours = {"filter2d": filter2d, "upsample2d": upsample2d, "downsample2d": downsample2d}[helper]
    want = ref_fn(_to_torch_nchw(x), f_t, impl="ref")
    got = ours(jnp.asarray(x), f_j)
    np.testing.assert_allclose(np.asarray(got), _from_torch_nchw(want), rtol=1e-5, atol=1e-5)


def test_setup_filter_rules():
    # 1-D < 8 taps -> outer product 2-D, normalised.
    f = setup_filter([1, 3, 3, 1])
    assert f.shape == (4, 4)
    np.testing.assert_allclose(float(jnp.sum(f)), 1.0, rtol=1e-6)
    # >= 8 taps stays separable.
    f = setup_filter(list(range(1, 9)))
    assert f.ndim == 1
    # gain scales by gain**(ndim/2).
    f2 = setup_filter([1, 3, 3, 1], gain=4)
    np.testing.assert_allclose(float(jnp.sum(f2)), 4.0, rtol=1e-6)
    f1 = setup_filter(list(range(1, 9)), gain=4)
    np.testing.assert_allclose(float(jnp.sum(f1)), 2.0, rtol=1e-6)
    # None -> impulse.
    assert setup_filter(None).shape == (1, 1)


def test_upsample_downsample_roundtrip_shapes():
    x = jnp.ones((1, 16, 16, 2))
    f = setup_filter([1, 3, 3, 1])
    up = upsample2d(x, f)
    assert up.shape == (1, 32, 32, 2)
    down = downsample2d(up, f)
    assert down.shape == (1, 16, 16, 2)
    # DC preservation: constant image stays ~constant in the interior.
    np.testing.assert_allclose(np.asarray(down[0, 4:-4, 4:-4, 0]), 1.0, rtol=1e-4)


@pytest.mark.parametrize(
    "taps,padding,flip,gain",
    [
        # The ADA geometric config: sym6 (12 taps), crop-back padding.
        ("sym6", -6, True, 1.0),
        ("sym6", 0, False, 1.0),
        ("box8", 2, False, 4.0),
    ],
)
def test_downsample2d_matrix_matches_downsample2d(taps, padding, flip, gain):
    """`downsample2d_matrix` (banded-matmul form) == `downsample2d`
    (depthwise-conv form), forward and VJP."""
    from gantrack_tpu.ops.upfirdn2d import downsample2d_matrix

    if taps == "sym6":
        from gantrack_tpu.training.augment import WAVELETS

        raw = WAVELETS["sym6"]
    else:
        raw = list(range(1, 9))
    f = setup_filter(raw)  # 1-D separable (>= 8 taps)
    taps_t = tuple(np.asarray(f, np.float32).tolist())
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((3, 28, 28, 2)).astype(np.float32))

    ref = downsample2d(x, f, down=2, padding=padding, flip_filter=flip, gain=gain)
    got = downsample2d_matrix(x, taps_t, down=2, padding=padding, flip_filter=flip, gain=gain)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)

    # VJP parity (the whole point of the matrix form is a cheap adjoint).
    ct = jnp.asarray(rng.standard_normal(ref.shape).astype(np.float32))
    g_ref = jax.grad(lambda v: jnp.vdot(
        downsample2d(v, f, down=2, padding=padding, flip_filter=flip, gain=gain), ct))(x)
    g_got = jax.grad(lambda v: jnp.vdot(
        downsample2d_matrix(v, taps_t, down=2, padding=padding, flip_filter=flip, gain=gain), ct))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "up,down,padding,flip,gain",
    [
        (2, 1, (3, 1, 3, 1), False, 4.0),   # conv2d_resample up path
        (1, 2, (1, 1, 1, 1), False, 1.0),   # conv2d_resample down path
        (1, 1, (2, 1, 2, 1), True, 1.0),    # full-res FIR pass
        (2, 2, (2, 2, 2, 2), False, 4.0),
    ],
)
def test_upfirdn2d_matrix_impl_matches_conv(up, down, padding, flip, gain):
    """The banded-matmul lowering == the depthwise-conv lowering for the
    networks' rank-1 `setup_filter([1,3,3,1])` product, fwd + VJP."""
    f = setup_filter([1, 3, 3, 1])  # 2-D outer product (size < 8)
    assert f.ndim == 2
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 12, 13, 3)).astype(np.float32))
    kw = dict(up=up, down=down, padding=list(padding), flip_filter=flip, gain=gain)
    ref = upfirdn2d(x, f, impl="conv", **kw)
    got = upfirdn2d(x, f, impl="matrix", **kw)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)
    ct = jnp.asarray(rng.standard_normal(ref.shape).astype(np.float32))
    g_ref = jax.grad(lambda v: jnp.vdot(upfirdn2d(v, f, impl="conv", **kw), ct))(x)
    g_got = jax.grad(lambda v: jnp.vdot(upfirdn2d(v, f, impl="matrix", **kw), ct))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-5, rtol=1e-5)


def test_upfirdn2d_grad_flows():
    f = setup_filter([1, 3, 3, 1])

    def loss(x):
        return jnp.sum(upsample2d(x, f) ** 2)

    g = jax.grad(loss)(jnp.ones((1, 8, 8, 1)))
    assert g.shape == (1, 8, 8, 1)
    assert bool(jnp.all(jnp.isfinite(g)))
    # Second-order (R1-style) gradients must also work.
    gg = jax.grad(lambda x: jnp.sum(jax.grad(loss)(x) ** 2))(jnp.ones((1, 8, 8, 1)))
    assert bool(jnp.all(jnp.isfinite(gg)))
