"""Gradient accumulation (micro_batches > 1) runs all phases and matches
the reference's sum-of-chunk-mean-grads semantics."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from gantrack_tpu.models.stylegan2 import Discriminator, Generator
from gantrack_tpu.parallel.mesh import create_mesh, shard_batch
from gantrack_tpu.training import (
    StyleGAN2Loss, StyleGAN2LossConfig, TrainStepConfig, TrainStepper,
    create_train_state, lazy_reg_adam,
)

pytestmark = pytest.mark.slow  # 8-device virtual-mesh compiles dominate

RES, ZDIM = 16, 8


def _mk(micro_batches, batch=8, n_dev=1):
    g = Generator(
        z_dim=ZDIM, c_dim=0, w_dim=ZDIM, img_resolution=RES, img_channels=1,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=128, channel_max=32, num_fp16_res=0),
    )
    d = Discriminator(
        c_dim=0, img_resolution=RES, img_channels=1,
        channel_base=128, channel_max=32, num_fp16_res=0,
        epilogue_kwargs=dict(mbstd_group_size=2),
    )
    opt_g = lazy_reg_adam(0.002, reg_interval=4)
    opt_d = lazy_reg_adam(0.002, reg_interval=16)
    state = create_train_state(g, d, jax.random.PRNGKey(0), opt_g, opt_d,
                               z_dim=ZDIM, c_dim=0, img_resolution=RES, img_channels=1)
    loss = StyleGAN2Loss(g, d, StyleGAN2LossConfig(r1_gamma=1.0, pl_weight=2.0))
    cfg = TrainStepConfig(batch_size=batch, z_dim=ZDIM, ada_target=0.6,
                          micro_batches=micro_batches)
    mesh = create_mesh(n_dev)
    return state, TrainStepper(loss, opt_g, opt_d, cfg, mesh), mesh


def test_micro_batch_step_runs_all_phases():
    state, stepper, mesh = _mk(micro_batches=2)
    img = jnp.asarray(np.random.default_rng(0).standard_normal((8, RES, RES, 1)), jnp.float32)
    state, moments = stepper(state, img)      # step 0: both regs active
    assert int(state.step) == 1
    assert "Loss/pl_penalty" in moments and "Loss/r1_penalty" in moments
    for name, m in moments.items():
        assert np.all(np.isfinite(np.asarray(m))), name
    # moment counts reflect the full batch across chunks
    assert float(moments["Loss/G/loss"][0]) == 8.0
    state, _ = stepper(state, img)            # plain variant with scan
    assert int(state.step) == 2


def test_micro_batch_with_mesh():
    state, stepper, mesh = _mk(micro_batches=2, n_dev=2)
    img = shard_batch(mesh, jnp.asarray(
        np.random.default_rng(1).standard_normal((8, RES, RES, 1)), jnp.float32))
    state, moments = stepper(state, img)
    assert int(state.step) == 1
    assert np.isfinite(float(state.pl_mean))
