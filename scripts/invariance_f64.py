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


def run_real(n_dev, img, batch):
    """The REAL SG2 networks — modulated_conv2d (+demod statistics),
    conv2d_resample, upfirdn2d FIR resampling, eq-LR scaling, per-sample
    noise, torgb accumulation, mapping w_avg EMA — through the production
    TrainStepper/Loss/AugmentPipe in float64 (``precision.pinned_float64``
    raises every model-internal f32 pin).  mbstd channels are off: mbstd
    is per-replica *in the reference too* (each GPU computes its own
    groups), so it is mesh-variant by design — its f64 reduction is
    checked separately against a NumPy oracle (``check_mbstd_oracle``).
    """
    from gantrack_tpu.models.stylegan2 import Discriminator, Generator

    g = Generator(
        z_dim=ZDIM, c_dim=0, w_dim=ZDIM, img_resolution=RES, img_channels=1,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=256, channel_max=32, num_fp16_res=0),
    )
    d = Discriminator(
        c_dim=0, img_resolution=RES, img_channels=1,
        channel_base=256, channel_max=32, num_fp16_res=0,
        epilogue_kwargs=dict(mbstd_group_size=2, mbstd_num_channels=0),
    )
    opt_g = lazy_reg_adam(0.0025, reg_interval=4)
    opt_d = lazy_reg_adam(0.0025, reg_interval=16)
    state = create_train_state(
        g, d, jax.random.PRNGKey(0), opt_g, opt_d,
        z_dim=ZDIM, c_dim=0, img_resolution=RES, img_channels=1,
    )
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


def check_mbstd_oracle():
    """f64 pin on the mbstd reduction itself: the sharded (per-replica)
    minibatch_stddev against an independent NumPy float64 oracle of the
    strided grouping, per shard, at 1e-12."""
    from functools import partial

    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from gantrack_tpu.models.stylegan2 import minibatch_stddev

    n, h, w, c, g = 8, 4, 4, 6, 2
    x = np.random.default_rng(1).standard_normal((n, h, w, c))
    mesh = create_mesh(4)
    f = shard_map(partial(minibatch_stddev, group_size=g, num_channels=1),
                  mesh=mesh, in_specs=P("data"), out_specs=P("data"))
    got = np.asarray(f(jnp.asarray(x)))[..., c:]

    want = np.empty((n, h, w, 1))
    for s in range(4):  # each shard of 2 computes its own strided groups
        xs = x[2 * s: 2 * s + 2]
        y = xs.reshape(g, 2 // g, h, w, 1, c)
        y = y - y.mean(axis=0, keepdims=True)
        y = np.sqrt((y ** 2).mean(axis=0) + 1e-8).mean(axis=(1, 2, 4))
        want[2 * s: 2 * s + 2] = np.tile(y, (g, 1))[:, None, None, :]
    err = float(np.max(np.abs(got - want)))
    assert err < 1e-12, f"mbstd oracle mismatch {err:.3e}"
    return err


def compare(r1, r4, tag):
    max_rel = 0.0
    for a, b in zip(jax.tree.leaves(r1), jax.tree.leaves(r4)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.maximum(np.abs(a), 1e-30)
        max_rel = max(max_rel, float(np.max(np.abs(a - b) / denom)))
    if not np.isfinite(max_rel) or max_rel > 1e-9:
        print(f"F64 INVARIANCE FAILED [{tag}] max_rel={max_rel:.3e}")
        return None
    print(f"F64 INVARIANCE OK [{tag}] max_rel={max_rel:.3e}")
    return max_rel


def main():
    assert jax.config.jax_enable_x64, "run with JAX_ENABLE_X64=1"
    assert len(jax.devices()) >= 4, "run with host_platform_device_count>=4"
    real = "--real-models" in sys.argv
    batch = 8
    img = np.random.default_rng(0).standard_normal(
        (batch, RES, RES, 1)).astype(np.float64)
    if real:
        from gantrack_tpu import precision

        with precision.pinned_float64():
            mb_err = check_mbstd_oracle()
            print(f"mbstd f64 oracle OK max_abs={mb_err:.3e}")
            r1 = run_real(1, img, batch)
            r4 = run_real(4, img, batch)
        return 0 if compare(r1, r4, "real-models") is not None else 1
    r1 = run(1, img, batch)
    r4 = run(4, img, batch)
    return 0 if compare(r1, r4, "tiny") is not None else 1


if __name__ == "__main__":
    sys.exit(main())
