"""Checkpoint → resume reproduces the uninterrupted trajectory exactly.

The reference's resume path restores only module weights and drops
optimizer moments / G-EMA rampup state / ADA p / pl_mean
(``training_loop_mi_multimodal.py:199-204``), so a resumed run diverges
from the uninterrupted one.  This framework checkpoints the FULL
GANTrainState; this test asserts the strong property that implies:
train 3 steps → save → restore → 3 more steps ≡ 6 uninterrupted steps,
bit-comparable on every parameter/EMA/optimizer leaf.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantrack_tpu.models.stylegan2 import Discriminator, Generator
from gantrack_tpu.parallel.mesh import create_mesh, shard_batch
from gantrack_tpu.training import (
    StyleGAN2Loss, StyleGAN2LossConfig, TrainStepConfig, TrainStepper,
    create_train_state, lazy_reg_adam,
)
from gantrack_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

pytestmark = pytest.mark.slow  # 8 step-variant compiles dominate (~7 min)

RES, ZDIM, BATCH = 16, 8, 4


def _stepper():
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
    state = create_train_state(
        g, d, jax.random.PRNGKey(0), opt_g, opt_d,
        z_dim=ZDIM, c_dim=0, img_resolution=RES, img_channels=1,
    )
    loss = StyleGAN2Loss(g, d, StyleGAN2LossConfig(r1_gamma=1.0, pl_weight=2.0))
    cfg = TrainStepConfig(batch_size=BATCH, z_dim=ZDIM, ada_target=0.6,
                          g_reg_interval=2, d_reg_interval=3)  # hit all phases in 6 steps
    stepper = TrainStepper(loss, opt_g, opt_d, cfg, create_mesh(1))
    return state, stepper


def _batches():
    rng = np.random.default_rng(7)
    return [jnp.asarray(rng.standard_normal((BATCH, RES, RES, 1)), jnp.float32)
            for _ in range(6)]


def test_resume_matches_uninterrupted(tmp_path):
    imgs = _batches()

    # Uninterrupted 6 steps.
    state_a, stepper_a = _stepper()
    for b in imgs:
        state_a, _ = stepper_a(state_a, b)

    # 3 steps → checkpoint → restore into a fresh state → 3 more.
    state_b, stepper_b = _stepper()
    for b in imgs[:3]:
        state_b, _ = stepper_b(state_b, b)
    path = save_checkpoint(str(tmp_path / "ckpt"), state_b)

    template, stepper_c = _stepper()  # fresh python objects, fresh compile cache
    restored = load_checkpoint(path, template)
    assert int(restored.step) == 3
    for b in imgs[3:]:
        restored, _ = stepper_c(restored, b)

    leaves_a = jax.tree.leaves(
        (state_a.params_g, state_a.params_d, state_a.params_g_ema,
         state_a.emas_g, state_a.opt_g, state_a.opt_d,
         state_a.pl_mean, state_a.ada_p, state_a.ada_signs))
    leaves_b = jax.tree.leaves(
        (restored.params_g, restored.params_d, restored.params_g_ema,
         restored.emas_g, restored.opt_g, restored.opt_d,
         restored.pl_mean, restored.ada_p, restored.ada_signs))
    assert int(restored.cur_nimg) == int(state_a.cur_nimg) == 6 * BATCH
    assert len(leaves_a) == len(leaves_b)  # a dropped leaf must FAIL, not truncate
    for la, lb in zip(leaves_a, leaves_b, strict=True):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=0, atol=0)
