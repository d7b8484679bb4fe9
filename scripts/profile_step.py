"""Capture an xplane trace of the FF train step and print the per-op breakdown.

Parses the .xplane.pb with tensorflow's xplane proto (no tensorboard
plugin needed). Groups device op time by fusion name prefix.
"""

import collections
import glob
import os
import sys
import time

import sys
sys.path.insert(0, "/root/repo")
import jax
# Match the resumed train CLI's program exactly (hardware RBG PRNG)
# so profiles hit the compile cache of the production run.
jax.config.update("jax_default_prng_impl", "rbg")
import jax.numpy as jnp
import numpy as np


def build_stepper(num_fp16_res: int = 4):
    from gantrack_tpu.models.stylegan2 import Discriminator, Generator
    from gantrack_tpu.parallel.mesh import create_mesh, shard_batch
    from gantrack_tpu.training import (
        StyleGAN2Loss, StyleGAN2LossConfig, TrainStepConfig, TrainStepper,
        create_train_state, lazy_reg_adam,
    )
    from gantrack_tpu.training.augment import AugmentPipe, medical_augment_config

    res, batch, zdim = 256, 32, 512
    g = Generator(
        z_dim=zdim, c_dim=0, w_dim=zdim, img_resolution=res, img_channels=1,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=16384, channel_max=512,
                              num_fp16_res=num_fp16_res),
    )
    d = Discriminator(
        c_dim=0, img_resolution=res, img_channels=1,
        channel_base=16384, channel_max=512, num_fp16_res=num_fp16_res,
        epilogue_kwargs=dict(mbstd_group_size=4),
    )
    opt_g = lazy_reg_adam(0.0025, reg_interval=4)
    opt_d = lazy_reg_adam(0.0025, reg_interval=16)
    state = create_train_state(
        g, d, jax.random.PRNGKey(0), opt_g, opt_d,
        z_dim=zdim, c_dim=0, img_resolution=res, img_channels=1,
    )
    augment = AugmentPipe(medical_augment_config(), res, res, 1)
    loss = StyleGAN2Loss(
        g, d, StyleGAN2LossConfig(r1_gamma=0.4096, style_mixing_prob=0.9, pl_weight=2.0),
        augment_fn=augment,
    )
    cfg = TrainStepConfig(batch_size=batch, z_dim=zdim, ada_target=0.6,
                      ema_rampup=None, ada_kimg=100)  # resumed-CLI values
    mesh = create_mesh(1)
    stepper = TrainStepper(loss, opt_g, opt_d, cfg, mesh)
    imgs = shard_batch(mesh, jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, res, res, 1)), jnp.float32
    ))
    zeros_c = jnp.zeros((batch, 0), jnp.float32)
    return stepper, state, imgs, zeros_c


def main():
    variant = tuple(bool(int(v)) for v in (sys.argv[1:3] or ["0", "0"]))
    stepper, state, imgs, zeros_c = build_stepper()
    fn = stepper.get(*variant)
    s = jax.tree.map(jnp.copy, state)
    s, _ = fn(s, imgs, zeros_c)
    float(jnp.sum(jax.tree.leaves(s.params_g)[0]))  # sync

    logdir = "/tmp/xprof"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        s, _ = fn(s, imgs, zeros_c)
    float(jnp.sum(jax.tree.leaves(s.params_g)[0]))
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", paths)
    tot = collections.Counter()
    cat = collections.Counter()
    for p in paths:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(p, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name.lower():
                continue
            evmeta = plane.event_metadata
            for line in plane.lines:
                for ev in line.events:
                    md = evmeta[ev.metadata_id]
                    name = md.name
                    dur = ev.duration_ps / 1e9  # ms
                    tot[name] += dur
            break_after = None
    n_steps = 3
    print(f"\n== top ops (ms per step, over {n_steps} steps) ==")
    total = sum(tot.values())
    for name, ms in tot.most_common(45):
        print(f"{ms/n_steps:9.3f} ms  {ms/total*100:5.1f}%  {name[:140]}")
    print(f"\nTOTAL device time per step: {total/n_steps:.1f} ms")


if __name__ == "__main__":
    main()
