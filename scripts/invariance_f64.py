"""float64 mesh-size-invariance pin for the train-step machinery.

Run with ``JAX_ENABLE_X64=1 JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=4``.

The f32 invariance tests (tests/test_train_step.py) carry a 5e-3 params
band justified by fp32 reassociation through the PL double-backward — wide
enough, in principle, to hide a subtly-wrong reduction on a *small* term.
This script closes that loophole for the step machinery itself: a
float64 stand-in G/D (same mapping/synthesis/emas surface as the real
models, which pin f32 internally for TPU and can't run f64) goes through
the REAL TrainStepper / StyleGAN2Loss / AugmentPipe code — all four
phases, Adam, ADA controller, per-sample-keyed augment + noise — and the
1-dev vs 4-dev post-step states are compared at ~1e-9, where fp
reassociation (≈1e-15 relative in f64) cannot mask anything.

Exit 0 + final line "F64 INVARIANCE OK max_rel=<x>" on success.
"""

import os
import sys

sys.path.insert(0, "/root/repo")

# Force the virtual CPU mesh before JAX init (the ambient axon plugin pins
# the TPU platform from sitecustomize — same dance as tests/conftest.py).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_CPU_ENABLE_ASYNC_DISPATCH"] = "0"
os.environ.setdefault("JAX_ENABLE_X64", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=4").strip()

import flax.linen as nn
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from gantrack_tpu.parallel.mesh import create_mesh, shard_batch
from gantrack_tpu.training import (
    StyleGAN2Loss, StyleGAN2LossConfig, TrainStepConfig, TrainStepper,
    create_train_state, lazy_reg_adam,
)
from gantrack_tpu.training.augment import AugmentPipe, medical_augment_config

RES, ZDIM, NUM_WS = 16, 8, 3
F64 = jnp.float64


class TinyMapping(nn.Module):
    @nn.compact
    def __call__(self, z, c, update_emas=False, **kw):
        x = nn.Dense(ZDIM, param_dtype=F64, name="fc0")(z.astype(F64))
        x = nn.tanh(x)
        x = nn.Dense(ZDIM, param_dtype=F64, name="fc1")(x)
        w_avg = self.variable("emas", "w_avg", jnp.zeros, (ZDIM,), F64)
        if update_emas and not self.is_initializing():
            mean_w = jax.lax.stop_gradient(jnp.mean(x, axis=0))
            w_avg.value = mean_w + (w_avg.value - mean_w) * 0.998
        return jnp.repeat(x[:, None, :], NUM_WS, axis=1)


class TinySynthesis(nn.Module):
    @nn.compact
    def __call__(self, ws, noise_mode="random", update_emas=False,
                 sample_idx=None, **kw):
        del update_emas
        n = ws.shape[0]
        x = nn.Dense(RES * RES, param_dtype=F64, name="expand")(
            ws.reshape(n, -1).astype(F64))
        x = x.reshape(n, RES, RES, 1)
        strength = self.param("noise_strength", nn.initializers.ones, (), F64)
        if noise_mode == "random":
            key = self.make_rng("noise")
            if sample_idx is not None:
                noise = jax.vmap(lambda i: jax.random.normal(
                    jax.random.fold_in(key, i), (RES, RES, 1)))(sample_idx)
            else:
                noise = jax.random.normal(key, (n, RES, RES, 1))
            x = x + noise.astype(F64) * strength
        return jnp.tanh(x)


class TinyG(nn.Module):
    def setup(self):
        self.mapping = TinyMapping()
        self.synthesis = TinySynthesis()

    def __call__(self, z, c, **kw):
        return self.synthesis(self.mapping(z, c))


class TinyD(nn.Module):
    @nn.compact
    def __call__(self, img, c=None, **kw):
        x = nn.Conv(4, (3, 3), strides=(2, 2), param_dtype=F64,
                    name="conv0")(img.astype(F64))
        x = nn.tanh(x)
        x = nn.Conv(4, (3, 3), strides=(2, 2), param_dtype=F64,
                    name="conv1")(x)
        x = nn.tanh(x).reshape(x.shape[0], -1)
        return nn.Dense(1, param_dtype=F64, name="out")(x)


def run(n_dev, img, batch):
    g, d = TinyG(), TinyD()
    opt_g = lazy_reg_adam(0.0025, reg_interval=4)
    opt_d = lazy_reg_adam(0.0025, reg_interval=16)
    state = create_train_state(
        g, d, jax.random.PRNGKey(0), opt_g, opt_d,
        z_dim=ZDIM, c_dim=0, img_resolution=RES, img_channels=1,
    )
    # Promote every float leaf (params, Adam moments, pl_mean, ada) to f64.
    state = jax.tree.map(
        lambda x: x.astype(F64)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        state)
    state = state.replace(ada_p=jnp.asarray(0.7, F64))
    augment = AugmentPipe(medical_augment_config(), RES, RES, 1,
                          impl="gather", compute_dtype=F64)
    loss = StyleGAN2Loss(
        g, d, StyleGAN2LossConfig(r1_gamma=1.0, pl_weight=2.0,
                                  pl_batch_shrink=1, noise_mode="random"),
        augment_fn=augment,
    )
    cfg = TrainStepConfig(batch_size=batch, z_dim=ZDIM, ada_target=0.6,
                          rng_mode="global_sample")
    mesh = create_mesh(n_dev)
    stepper = TrainStepper(loss, opt_g, opt_d, cfg, mesh)
    sharded = shard_batch(mesh, jnp.asarray(img))
    zc = jnp.zeros((batch, 0), F64)
    new_state, _ = stepper.get(True, True)(state, sharded, zc)
    return jax.device_get((
        new_state.params_g, new_state.params_d, new_state.params_g_ema,
        new_state.emas_g, new_state.pl_mean, new_state.ada_p,
        new_state.ada_signs,
    ))


def main():
    assert jax.config.jax_enable_x64, "run with JAX_ENABLE_X64=1"
    assert len(jax.devices()) >= 4, "run with host_platform_device_count>=4"
    batch = 8
    img = np.random.default_rng(0).standard_normal(
        (batch, RES, RES, 1)).astype(np.float64)
    r1 = run(1, img, batch)
    r4 = run(4, img, batch)
    max_rel = 0.0
    for a, b in zip(jax.tree.leaves(r1), jax.tree.leaves(r4)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.maximum(np.abs(a), 1e-30)
        max_rel = max(max_rel, float(np.max(np.abs(a - b) / denom)))
    if not np.isfinite(max_rel) or max_rel > 1e-9:
        print(f"F64 INVARIANCE FAILED max_rel={max_rel:.3e}")
        return 1
    print(f"F64 INVARIANCE OK max_rel={max_rel:.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
