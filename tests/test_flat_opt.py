"""GANTRACK_FLAT_OPT=1 (optax.flatten-wrapped Adam) must be a pure
performance lever: identical updates to the per-leaf optimizer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from gantrack_tpu.training import lazy_reg_adam


def _tree(key):
    ks = jax.random.split(key, 4)
    return {
        "conv": {"w": jax.random.normal(ks[0], (3, 3, 8, 16)),
                 "b": jnp.zeros((16,))},
        "dense": {"w": jax.random.normal(ks[1], (16, 4)),
                  "b": jax.random.normal(ks[2], (4,))},
        "scalar": jax.random.normal(ks[3], ()),
    }


@pytest.mark.parametrize("reg_interval", [None, 4])
def test_flat_opt_matches_per_leaf(monkeypatch, reg_interval):
    params = _tree(jax.random.PRNGKey(0))

    monkeypatch.delenv("GANTRACK_FLAT_OPT", raising=False)
    ref = lazy_reg_adam(0.002, reg_interval=reg_interval)
    monkeypatch.setenv("GANTRACK_FLAT_OPT", "1")
    flat = lazy_reg_adam(0.002, reg_interval=reg_interval)

    s_ref, s_flat = ref.init(params), flat.init(params)
    p_ref = p_flat = params
    for step in range(3):
        grads = _tree(jax.random.PRNGKey(step + 1))
        u_ref, s_ref = ref.update(grads, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u_ref)
        u_flat, s_flat = flat.update(grads, s_flat, p_flat)
        p_flat = optax.apply_updates(p_flat, u_flat)

    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_flat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
