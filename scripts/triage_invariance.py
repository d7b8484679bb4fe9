"""Triage which subsystem breaks f64 mesh-size invariance.

Variants: augment on/off × noise random/const × phases, per-leaf report.
"""

import os
import sys

sys.path.insert(0, "/root/repo")

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

from invariance_f64 import TinyD, TinyG  # noqa: E402


def run(n_dev, img, batch, *, augment, noise_mode, do_gpl, do_dr1,
        mixing=0.9):
    g, d = TinyG(), TinyD()
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
    augment_fn = None
    if augment:
        augment_fn = AugmentPipe(medical_augment_config(), RES, RES, 1,
                                 impl="gather", compute_dtype=F64)
    loss = StyleGAN2Loss(
        g, d, StyleGAN2LossConfig(r1_gamma=1.0, pl_weight=2.0,
                                  pl_batch_shrink=1, noise_mode=noise_mode,
                                  style_mixing_prob=mixing),
        augment_fn=augment_fn,
    )
    cfg = TrainStepConfig(batch_size=batch, z_dim=ZDIM, ada_target=0.6,
                          rng_mode="global_sample")
    mesh = create_mesh(n_dev)
    stepper = TrainStepper(loss, opt_g, opt_d, cfg, mesh)
    sharded = shard_batch(mesh, jnp.asarray(img))
    zc = jnp.zeros((batch, 0), F64)
    new_state, _ = stepper.get(do_gpl, do_dr1)(state, sharded, zc)
    return {
        "params_g": new_state.params_g, "params_d": new_state.params_d,
        "g_ema": new_state.params_g_ema, "emas_g": new_state.emas_g,
        "pl_mean": new_state.pl_mean, "ada_p": new_state.ada_p,
        "ada_signs": new_state.ada_signs,
    }


def compare(tag, **kw):
    batch = 8
    img = np.random.default_rng(0).standard_normal(
        (batch, RES, RES, 1)).astype(np.float64)
    r1 = jax.device_get(run(1, img, batch, **kw))
    r4 = jax.device_get(run(4, img, batch, **kw))
    worst = {}
    for name in r1:
        rel = 0.0
        for a, b in zip(jax.tree.leaves(r1[name]), jax.tree.leaves(r4[name])):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            denom = np.maximum(np.abs(a), 1e-30)
            rel = max(rel, float(np.max(np.abs(a - b) / denom)))
        worst[name] = rel
    bad = {k: f"{v:.2e}" for k, v in worst.items() if v > 1e-9}
    print(f"{tag}: {'OK' if not bad else 'FAIL ' + str(bad)}")


if __name__ == "__main__":
    compare("noise=const aug=off  (F,F)", augment=False, noise_mode="const",
            do_gpl=False, do_dr1=False)
    compare("noise=rand  aug=off  (F,F)", augment=False, noise_mode="random",
            do_gpl=False, do_dr1=False)
    compare("noise=const aug=on   (F,F)", augment=True, noise_mode="const",
            do_gpl=False, do_dr1=False)
    compare("noise=rand  aug=on   (F,F)", augment=True, noise_mode="random",
            do_gpl=False, do_dr1=False)
    compare("noise=rand  aug=on   (T,F)", augment=True, noise_mode="random",
            do_gpl=True, do_dr1=False)
    compare("noise=rand  aug=on   (F,T)", augment=True, noise_mode="random",
            do_gpl=False, do_dr1=True)
    compare("noise=rand  aug=on   (T,T)", augment=True, noise_mode="random",
            do_gpl=True, do_dr1=True)
