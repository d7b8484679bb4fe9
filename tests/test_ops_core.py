"""bias_act / conv2d_resample / modulated_conv2d / grid_sample / filtered_lrelu
numerics vs the reference pure-PyTorch oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantrack_tpu.ops import (
    bias_act,
    conv2d_resample,
    filtered_lrelu,
    grid_sample,
    affine_grid,
    modulated_conv2d,
    setup_filter,
)
from conftest import has_reference, import_reference_module

requires_reference = pytest.mark.skipif(not has_reference(), reason="reference tree not present")


def _to_torch_nchw(x):
    import torch

    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _from_torch_nchw(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _to_torch_oihw(w):
    """HWIO -> OIHW."""
    import torch

    return torch.from_numpy(np.transpose(w, (3, 2, 0, 1)).copy())


# ---------------------------------------------------------------- bias_act

@requires_reference
@pytest.mark.parametrize("act", ["linear", "relu", "lrelu", "tanh", "sigmoid", "elu", "selu", "softplus", "swish"])
def test_bias_act_matches_reference(act):
    torch = pytest.importorskip("torch")
    ref = import_reference_module("torch_utils.ops.bias_act")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 4, 5, 6)).astype(np.float32) * 3
    b = rng.standard_normal((6,)).astype(np.float32)

    want = ref._bias_act_ref(_to_torch_nchw(x), torch.from_numpy(b.copy()), dim=1, act=act)
    got = bias_act(jnp.asarray(x), jnp.asarray(b), dim=-1, act=act)
    # 1e-4: XLA and torch use different transcendental approximations.
    np.testing.assert_allclose(np.asarray(got), _from_torch_nchw(want), rtol=1e-4, atol=1e-4)


@requires_reference
def test_bias_act_gain_clamp_matches_reference():
    torch = pytest.importorskip("torch")
    ref = import_reference_module("torch_utils.ops.bias_act")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 3, 4)).astype(np.float32) * 10
    b = rng.standard_normal((4,)).astype(np.float32)
    want = ref._bias_act_ref(_to_torch_nchw(x), torch.from_numpy(b.copy()), dim=1,
                             act="lrelu", gain=1.7, clamp=5.0)
    got = bias_act(jnp.asarray(x), jnp.asarray(b), act="lrelu", gain=1.7, clamp=5.0)
    np.testing.assert_allclose(np.asarray(got), _from_torch_nchw(want), rtol=1e-5, atol=1e-5)


def test_bias_act_second_order_grad():
    def f(x):
        return jnp.sum(bias_act(x, act="lrelu", clamp=2.0) ** 2)

    x = jnp.linspace(-3, 3, 24).reshape(1, 2, 3, 4)
    g = jax.grad(f)(x)
    gg = jax.grad(lambda x: jnp.sum(jax.grad(f)(x) ** 2))(x)
    assert bool(jnp.all(jnp.isfinite(g))) and bool(jnp.all(jnp.isfinite(gg)))


# ---------------------------------------------------------- conv2d_resample

@requires_reference
@pytest.mark.parametrize("k,up,down,groups", [
    (3, 1, 1, 1),
    (3, 2, 1, 1),
    (3, 1, 2, 1),
    (1, 2, 1, 1),
    (1, 1, 2, 1),
    (4, 2, 1, 1),
    (3, 1, 1, 2),
    (3, 2, 2, 1),
])
def test_conv2d_resample_matches_reference(k, up, down, groups):
    torch = pytest.importorskip("torch")
    ref_mod = import_reference_module("torch_utils.ops.conv2d_resample")
    ref_up = import_reference_module("torch_utils.ops.upfirdn2d")
    rng = np.random.default_rng(42)
    in_ch, out_ch = 4, 6
    x = rng.standard_normal((2, 8, 8, in_ch)).astype(np.float32)
    w = rng.standard_normal((k, k, in_ch // groups, out_ch)).astype(np.float32)
    f_t = ref_up.setup_filter([1, 3, 3, 1])
    f_j = setup_filter([1, 3, 3, 1])
    padding = k // 2
    flip_weight = up == 1

    want = ref_mod.conv2d_resample(
        _to_torch_nchw(x), _to_torch_oihw(w), f=f_t, up=up, down=down,
        padding=padding, groups=groups, flip_weight=flip_weight,
    )
    got = conv2d_resample(
        jnp.asarray(x), jnp.asarray(w), f=f_j, up=up, down=down,
        padding=padding, groups=groups, flip_weight=flip_weight,
    )
    np.testing.assert_allclose(np.asarray(got), _from_torch_nchw(want), rtol=1e-4, atol=1e-4)


# -------------------------------------------------------- modulated_conv2d

@requires_reference
@pytest.mark.parametrize("up,demodulate,fused,noise", [
    (1, True, False, False),
    (2, True, False, True),
    (1, False, False, False),
    (1, True, True, False),
    (2, True, True, False),
])
def test_modulated_conv2d_matches_reference(up, demodulate, fused, noise):
    torch = pytest.importorskip("torch")
    nets = import_reference_module("training.networks_stylegan2")
    ref_up = import_reference_module("torch_utils.ops.upfirdn2d")
    rng = np.random.default_rng(3)
    n, in_ch, out_ch, k, res = 2, 4, 5, 3, 8
    x = rng.standard_normal((n, res, res, in_ch)).astype(np.float32)
    w = rng.standard_normal((k, k, in_ch, out_ch)).astype(np.float32)
    styles = rng.standard_normal((n, in_ch)).astype(np.float32) + 1.0
    nz = rng.standard_normal((n, res * up, res * up, 1)).astype(np.float32) if noise else None

    f_t = ref_up.setup_filter([1, 3, 3, 1])
    f_j = setup_filter([1, 3, 3, 1])
    noise_t = None
    if noise:
        # reference broadcasts [N,1,H,W]
        noise_t = _to_torch_nchw(nz)

    want = nets.modulated_conv2d(
        x=_to_torch_nchw(x), weight=_to_torch_oihw(w),
        styles=torch.from_numpy(styles.copy()), noise=noise_t, up=up,
        padding=k // 2, resample_filter=f_t, demodulate=demodulate,
        flip_weight=(up == 1), fused_modconv=fused,
    )
    got = modulated_conv2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(styles),
        noise=jnp.asarray(nz) if noise else None, up=up, padding=k // 2,
        resample_filter=f_j, demodulate=demodulate,
        flip_weight=(up == 1), fused_modconv=fused,
    )
    np.testing.assert_allclose(np.asarray(got), _from_torch_nchw(want), rtol=2e-4, atol=2e-4)


def test_modulated_conv2d_fused_equals_unfused():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((3, 8, 8, 6)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 8)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((3, 6)).astype(np.float32))
    a = modulated_conv2d(x, w, s, padding=1, fused_modconv=False)
    b = modulated_conv2d(x, w, s, padding=1, fused_modconv=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------- grid_sample

@requires_reference
def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 7, 9, 3)).astype(np.float32)
    grid = (rng.random((2, 5, 6, 2)).astype(np.float32) * 2.4 - 1.2)  # incl. out-of-bounds

    want = torch.nn.functional.grid_sample(
        _to_torch_nchw(x), torch.from_numpy(grid.copy()),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    )
    got = grid_sample(jnp.asarray(x), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(got), _from_torch_nchw(want), rtol=1e-5, atol=1e-5)


@requires_reference
def test_affine_grid_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(6)
    theta = rng.standard_normal((2, 2, 3)).astype(np.float32) * 0.5
    want = torch.nn.functional.affine_grid(
        torch.from_numpy(theta.copy()), [2, 3, 6, 7], align_corners=False
    )
    got = affine_grid(jnp.asarray(theta), 6, 7)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-6)


def test_grid_sample_double_grad():
    x = jnp.ones((1, 4, 4, 1))
    grid = jnp.zeros((1, 3, 3, 2))

    def f(x):
        return jnp.sum(grid_sample(x, grid) ** 2)

    gg = jax.grad(lambda x: jnp.sum(jax.grad(f)(x) ** 2))(x)
    assert bool(jnp.all(jnp.isfinite(gg)))


# ---------------------------------------------------------- filtered_lrelu

@requires_reference
@pytest.mark.parametrize("up,down,padding", [(1, 1, 0), (2, 1, 3), (2, 2, [2, 1, 1, 3]), (1, 2, 4)])
def test_filtered_lrelu_matches_reference(up, down, padding):
    torch = pytest.importorskip("torch")
    ref = import_reference_module("torch_utils.ops.filtered_lrelu")
    ref_up = import_reference_module("torch_utils.ops.upfirdn2d")
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)
    fu_t = ref_up.setup_filter([1, 3, 3, 1])
    fd_t = ref_up.setup_filter([1, 2, 1])
    fu_j = setup_filter([1, 3, 3, 1])
    fd_j = setup_filter([1, 2, 1])

    want = ref._filtered_lrelu_ref(
        _to_torch_nchw(x), fu=fu_t, fd=fd_t, b=torch.from_numpy(b.copy()),
        up=up, down=down, padding=padding, gain=np.sqrt(2), slope=0.2, clamp=10.0,
    )
    got = filtered_lrelu(
        jnp.asarray(x), fu=fu_j, fd=fd_j, b=jnp.asarray(b),
        up=up, down=down, padding=padding, clamp=10.0,
    )
    np.testing.assert_allclose(np.asarray(got), _from_torch_nchw(want), rtol=1e-4, atol=1e-4)
