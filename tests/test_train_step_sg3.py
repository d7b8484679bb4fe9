"""StyleGAN3 through the full training stepper (magnitude EMAs update via
the generic emas path; no PL reg, blur ramp active for the -r config)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantrack_tpu.models.stylegan2 import Discriminator
from gantrack_tpu.models.stylegan3 import Generator as SG3Generator
from gantrack_tpu.parallel.mesh import create_mesh, shard_batch
from gantrack_tpu.training import (
    StyleGAN2Loss, StyleGAN2LossConfig, TrainStepConfig, TrainStepper,
    create_train_state, lazy_reg_adam,
)

pytestmark = pytest.mark.slow  # 8-device virtual-mesh compiles dominate

RES = 32
ZDIM = 8


def test_sg3_train_step():
    g = SG3Generator(
        z_dim=ZDIM, c_dim=0, w_dim=ZDIM, img_resolution=RES, img_channels=1,
        channel_base=1024, channel_max=32, num_fp16_res=0,
        synthesis_kwargs=dict(num_layers=6, num_critical=2),
    )
    d = Discriminator(
        c_dim=0, img_resolution=RES, img_channels=1,
        channel_base=128, channel_max=32, num_fp16_res=0,
        epilogue_kwargs=dict(mbstd_group_size=2),
    )
    opt_g = lazy_reg_adam(0.0025)
    opt_d = lazy_reg_adam(0.002, reg_interval=16)
    state = create_train_state(
        g, d, jax.random.PRNGKey(0), opt_g, opt_d,
        z_dim=ZDIM, c_dim=0, img_resolution=RES, img_channels=1,
    )
    # SG3-T recipe: no PL reg, no style mixing off... mixing stays on for -t
    loss = StyleGAN2Loss(g, d, StyleGAN2LossConfig(
        r1_gamma=1.0, pl_weight=0.0, style_mixing_prob=0.9,
    ))
    cfg = TrainStepConfig(batch_size=4, z_dim=ZDIM, g_reg_interval=None)
    mesh = create_mesh(2)
    stepper = TrainStepper(loss, opt_g, opt_d, cfg, mesh)

    img = shard_batch(mesh, jnp.asarray(
        np.random.default_rng(0).standard_normal((4, RES, RES, 1)), jnp.float32
    ))
    mags0 = [np.asarray(v).copy() for v in jax.tree.leaves(state.emas_g["synthesis"])]
    state, moments = stepper(state, img)
    assert int(state.step) == 1
    for name, m in moments.items():
        assert np.all(np.isfinite(np.asarray(m))), name
    mags1 = [np.asarray(v) for v in jax.tree.leaves(state.emas_g["synthesis"])]
    assert any(not np.allclose(a, b) for a, b in zip(mags0, mags1)), \
        "magnitude EMAs must update during the Dmain fake pass"
    # w_avg updated too
    assert np.isfinite(np.asarray(state.emas_g["mapping"]["w_avg"])).all()
