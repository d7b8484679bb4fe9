"""Space-to-depth 3×3 conv rewrite: exact equivalence with the plain conv."""

import numpy as np

import jax
import jax.numpy as jnp

from gantrack_tpu.ops.attic.space_to_depth import (
    conv3x3_s2d,
    depth_to_space,
    s2d_kernel,
    space_to_depth,
)


def test_s2d_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 12, 3)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x))


def test_conv3x3_s2d_exact():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 5)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 5, 7)), jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = conv3x3_s2d(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_s2d_kernel_sparsity():
    w = jnp.ones((3, 3, 2, 2))
    ws = np.asarray(s2d_kernel(w))
    # exactly 9 taps per (input sub-pixel, output sub-pixel) pair survive:
    # total nonzero = 9 (orig taps) * 4 (dy,dx) * 4 (py,px) blocks / ...
    nonzero = (ws != 0).sum()
    # per (dy,py) row pair the valid block-row count is 1 (aligned) or 2
    # (staggered): Σ = 1+2+2+1 = 6; independently for columns -> 36·C·C'.
    assert nonzero == 36 * 2 * 2
