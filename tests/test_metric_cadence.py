"""Metric-cadence mitigation (VERDICT r4 #8): ``metric_snapshot_every``
and ``metric_async`` in the training loop — what the reference cannot do
(its metric eval is coupled to every snapshot and blocks the loop,
``training_loop_mi_multimodal.py:417-436``), offered because at the
reference's own ``--snap=10 --tick=4`` recipe metrics cost ~24% of wall
time (``docs/evidence/metric_overhead.md``)."""

import json
import os
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    from gantrack_tpu.data.preprocess.packaging import pack_shards
    from gantrack_tpu.data.dataset import open_dataset
    from gantrack_tpu.data.loader import InfiniteLoader
    from gantrack_tpu.models.stylegan2 import Discriminator, Generator
    from gantrack_tpu.parallel.mesh import create_mesh
    from gantrack_tpu.training import (
        StyleGAN2Loss, StyleGAN2LossConfig, TrainStepConfig, TrainStepper,
        create_train_state, lazy_reg_adam,
    )

    tmp = tmp_path_factory.mktemp("cadence")
    rng = np.random.default_rng(0)
    images = [(rng.random((16, 16, 1)) * 255).astype(np.float32) for _ in range(32)]
    pack_shards(str(tmp), "train", images, [f"s{i}" for i in range(32)])
    dataset = open_dataset(str(tmp), split="train")

    g = Generator(
        z_dim=8, c_dim=0, w_dim=8, img_resolution=16, img_channels=1,
        mapping_kwargs=dict(num_layers=1),
        synthesis_kwargs=dict(channel_base=64, channel_max=16, num_fp16_res=0),
    )
    d = Discriminator(
        c_dim=0, img_resolution=16, img_channels=1,
        channel_base=64, channel_max=16, num_fp16_res=0,
        epilogue_kwargs=dict(mbstd_group_size=2),
    )
    opt_g = lazy_reg_adam(0.0025, reg_interval=4)
    opt_d = lazy_reg_adam(0.0025, reg_interval=16)
    loss = StyleGAN2Loss(g, d, StyleGAN2LossConfig(r1_gamma=0.4096))
    cfg = TrainStepConfig(batch_size=8, z_dim=8)
    mesh = create_mesh(2)
    stepper = TrainStepper(loss, opt_g, opt_d, cfg, mesh)

    def fresh_state():
        return create_train_state(
            g, d, jax.random.PRNGKey(0), opt_g, opt_d,
            z_dim=8, c_dim=0, img_resolution=16, img_channels=1)

    def fresh_loader():
        return InfiniteLoader(dataset, batch_size=8, seed=0, start=False)

    return dict(stepper=stepper, mesh=mesh, fresh_state=fresh_state,
                fresh_loader=fresh_loader)


def _run(harness, tmp_path, name, **loop_kwargs):
    from gantrack_tpu.training.loop import training_loop

    run_dir = str(tmp_path / name)
    os.makedirs(run_dir)
    calls = []

    def metric_fn(state, kimg=None):
        calls.append(dict(kimg=kimg, thread=threading.get_ident(),
                          step=int(state.step)))
        return {"fake_metric": float(kimg or 0)}

    training_loop(
        run_dir=run_dir, stepper=harness["stepper"],
        state=harness["fresh_state"](), loader=harness["fresh_loader"](),
        mesh=harness["mesh"], total_kimg=3, kimg_per_tick=1,
        snapshot_ticks=1, image_snapshot_ticks=None,
        metrics=["fake_metric"], metric_fn=metric_fn, verbose=False,
        **loop_kwargs,
    )
    return calls


def test_metric_snapshot_every_skips_but_checkpoints(harness, tmp_path):
    calls = _run(harness, tmp_path, "every2", metric_snapshot_every=2)
    # snapshots at kimg 1,2,3; metrics on the 1st and the final (always).
    assert [c["kimg"] for c in calls] == [1, 3]
    # every snapshot still wrote a checkpoint
    ckpts = os.listdir(str(tmp_path / "every2" / "checkpoints"))
    assert len(ckpts) == 3, ckpts


def test_metric_async_runs_off_thread_with_kimg_stamp(harness, tmp_path):
    calls = _run(harness, tmp_path, "async", metric_async=True)
    assert [c["kimg"] for c in calls] == [1, 2, 3]
    main = threading.get_ident()
    # non-final metrics run off-thread; the final one runs sync (done)
    assert all(c["thread"] != main for c in calls[:-1])
    assert calls[-1]["thread"] == main
    # the captured state is the snapshot's, not a later one
    steps = [c["step"] for c in calls]
    assert steps == sorted(steps) and len(set(steps)) == 3


def test_metric_failure_does_not_kill_training(harness, tmp_path, capsys):
    from gantrack_tpu.training.loop import training_loop

    run_dir = str(tmp_path / "faulty")
    os.makedirs(run_dir)

    def metric_fn(state, kimg=None):
        raise RuntimeError("transient remote-compile flake")

    state = training_loop(
        run_dir=run_dir, stepper=harness["stepper"],
        state=harness["fresh_state"](), loader=harness["fresh_loader"](),
        mesh=harness["mesh"], total_kimg=2, kimg_per_tick=1,
        snapshot_ticks=1, image_snapshot_ticks=None,
        metrics=["fake_metric"], metric_fn=metric_fn, verbose=False,
    )
    assert int(state.cur_nimg) >= 2000  # trained to completion
    out = capsys.readouterr().out
    assert "metric evaluation failed" in out
