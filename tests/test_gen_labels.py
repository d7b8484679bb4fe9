"""Generator-pass labels follow the dataset's empirical distribution
(reference training_loop_mi_multimodal.py:319-321)."""

import numpy as np

import jax
import jax.numpy as jnp

from gantrack_tpu.training.step import sample_gen_labels


def test_gen_label_frequencies_track_bank():
    # Skewed one-hot bank: 80% class 0, 20% class 1 (claro death/alive shape).
    bank = np.zeros((1000, 2), np.float32)
    bank[:800, 0] = 1
    bank[800:, 1] = 1
    out = np.asarray(sample_gen_labels(jax.random.PRNGKey(0), jnp.asarray(bank), 4000))
    freq = out.mean(axis=0)
    np.testing.assert_allclose(freq, [0.8, 0.2], atol=0.03)


def test_gen_labels_are_bank_rows():
    bank = np.asarray([[0.5, 1.5], [2.5, 3.5], [4.5, 5.5]], np.float32)
    out = np.asarray(sample_gen_labels(jax.random.PRNGKey(1), jnp.asarray(bank), 64))
    for row in out:
        assert any(np.allclose(row, b) for b in bank), row


def test_conditional_step_with_label_bank_runs():
    """A conditional train step with a skewed label bank compiles and
    updates state (single-device fast path, tiny model)."""
    import numpy as np

    from gantrack_tpu.models.stylegan2 import Discriminator, Generator
    from gantrack_tpu.parallel.mesh import create_mesh, shard_batch
    from gantrack_tpu.training import (
        StyleGAN2Loss, StyleGAN2LossConfig, TrainStepConfig, TrainStepper,
        create_train_state, lazy_reg_adam,
    )

    res, zdim, cdim, batch = 16, 8, 2, 4
    g = Generator(z_dim=zdim, c_dim=cdim, w_dim=zdim, img_resolution=res,
                  img_channels=1, mapping_kwargs=dict(num_layers=1),
                  synthesis_kwargs=dict(channel_base=128, channel_max=16,
                                        num_fp16_res=0))
    d = Discriminator(c_dim=cdim, img_resolution=res, img_channels=1,
                      channel_base=128, channel_max=16, num_fp16_res=0,
                      epilogue_kwargs=dict(mbstd_group_size=1))
    opt_g = lazy_reg_adam(2e-3, reg_interval=4)
    opt_d = lazy_reg_adam(2e-3, reg_interval=16)
    state = create_train_state(g, d, jax.random.PRNGKey(0), opt_g, opt_d,
                               z_dim=zdim, c_dim=cdim, img_resolution=res,
                               img_channels=1)
    loss = StyleGAN2Loss(g, d, StyleGAN2LossConfig(
        r1_gamma=0.1, pl_weight=0.0, style_mixing_prob=0.0))
    bank = np.zeros((50, cdim), np.float32)
    bank[:40, 0] = 1
    bank[40:, 1] = 1
    mesh = create_mesh(1)
    stepper = TrainStepper(
        loss, opt_g, opt_d,
        TrainStepConfig(batch_size=batch, z_dim=zdim, c_dim=cdim), mesh,
        label_bank=bank)
    imgs = shard_batch(mesh, jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, res, res, 1)),
        jnp.float32))
    labels = shard_batch(mesh, jnp.asarray(bank[:batch]))
    l0 = np.asarray(jax.tree.leaves(state.params_g)[0])  # donated below
    new_state, moments = stepper.get(False, False)(state, imgs, labels)
    l1 = np.asarray(jax.tree.leaves(new_state.params_g)[0])
    assert not np.allclose(l0, l1)
