"""End-to-end: synthetic dataset → train CLI config path → training loop →
run-dir artifacts (stats.jsonl, image grids, checkpoint) → resume → gen.

This is the framework-level smoke covering what the reference exercises
manually (SURVEY §4): a short real training run through the public entry
points.
"""

import json
import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.slow  # 8-device virtual-mesh compiles dominate


@pytest.fixture(scope="module")
def shard_dataset(tmp_path_factory):
    from gantrack_tpu.data.preprocess.packaging import pack_shards

    tmp = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(0)
    images = [(rng.random((32, 32, 1)) * 255).astype(np.float32) for _ in range(64)]
    pack_shards(str(tmp), "train", images, [f"s{i}" for i in range(64)])
    return str(tmp)


def test_full_training_run_and_artifacts(shard_dataset, tmp_path):
    from gantrack_tpu.data.dataset import open_dataset
    from gantrack_tpu.data.loader import InfiniteLoader
    from gantrack_tpu.models.stylegan2 import Discriminator, Generator
    from gantrack_tpu.parallel.mesh import create_mesh
    from gantrack_tpu.training import (
        StyleGAN2Loss, StyleGAN2LossConfig, TrainStepConfig, TrainStepper,
        create_train_state, lazy_reg_adam,
    )
    from gantrack_tpu.training.augment import AugmentPipe, medical_augment_config
    from gantrack_tpu.training.loop import training_loop
    from gantrack_tpu.utils.checkpoint import (
        latest_checkpoint, load_checkpoint, save_checkpoint,
    )
    import jax.numpy as jnp

    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)

    dataset = open_dataset(shard_dataset, split="train")
    batch = 8
    g = Generator(
        z_dim=16, c_dim=0, w_dim=16, img_resolution=32, img_channels=1,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=256, channel_max=64, num_fp16_res=0),
    )
    d = Discriminator(
        c_dim=0, img_resolution=32, img_channels=1,
        channel_base=256, channel_max=64, num_fp16_res=0,
        epilogue_kwargs=dict(mbstd_group_size=2),
    )
    opt_g = lazy_reg_adam(0.0025, reg_interval=4)
    opt_d = lazy_reg_adam(0.0025, reg_interval=16)
    state = create_train_state(g, d, jax.random.PRNGKey(0), opt_g, opt_d,
                               z_dim=16, c_dim=0, img_resolution=32, img_channels=1)
    loss = StyleGAN2Loss(
        g, d, StyleGAN2LossConfig(r1_gamma=0.4096),
        augment_fn=AugmentPipe(medical_augment_config(), 32, 32, 1),
    )
    cfg = TrainStepConfig(batch_size=batch, z_dim=16, ada_target=0.6)
    mesh = create_mesh(2)
    stepper = TrainStepper(loss, opt_g, opt_d, cfg, mesh)
    loader = InfiniteLoader(dataset, batch_size=batch, seed=0, start=False)

    @jax.jit
    def _sample(vars_g_ema, z):
        return g.apply(vars_g_ema, z, None, noise_mode="const")

    def sample_fn(state, grid_z, grid_c):
        return np.asarray(_sample(state.vars_g_ema, jnp.asarray(grid_z[:8, :16])))

    state = training_loop(
        run_dir=run_dir, stepper=stepper, state=state, loader=loader, mesh=mesh,
        total_kimg=1, kimg_per_tick=1, snapshot_ticks=1, image_snapshot_ticks=1,
        sample_fn=sample_fn, verbose=False,
    )

    # Artifacts.
    assert os.path.exists(os.path.join(run_dir, "stats.jsonl"))
    assert os.path.exists(os.path.join(run_dir, "reals.png"))
    assert os.path.exists(os.path.join(run_dir, "fakes_init.png"))
    with open(os.path.join(run_dir, "stats.jsonl")) as f:
        records = [json.loads(line) for line in f]
    assert len(records) >= 1
    assert "Loss/G/loss" in records[-1]
    assert np.isfinite(records[-1]["Loss/G/loss"])

    ckpt = latest_checkpoint(os.path.join(run_dir, "checkpoints"))
    assert ckpt is not None

    # Exact resume: full state roundtrip.
    restored = load_checkpoint(ckpt, state)
    assert int(restored.step) == int(state.step)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params_g_ema)[0]),
        np.asarray(jax.tree.leaves(state.params_g_ema)[0]),
    )

    # EMA sampling produces finite images in range.
    img = sample_fn(state, np.random.default_rng(1).standard_normal((8, 16)).astype(np.float32), None)
    assert img.shape == (8, 32, 32, 1)
    assert np.all(np.isfinite(img))
