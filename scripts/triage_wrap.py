"""Bisect the 100x step slowdown: phases are fast, the composed
shard_map step is not.  Compare: (A) plain jit of the device step with
collectives stubbed, (B) shard_map+jit without donation, (C) current."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from gantrack_tpu.models.stylegan2 import Discriminator, Generator
from gantrack_tpu.parallel.mesh import create_mesh, shard_batch
from gantrack_tpu.training import (
    StyleGAN2Loss, StyleGAN2LossConfig, TrainStepConfig, TrainStepper,
    create_train_state, lazy_reg_adam,
)
from gantrack_tpu.training.augment import AugmentPipe, medical_augment_config


def main():
    res, batch, zdim = 256, 32, 512
    g = Generator(
        z_dim=zdim, c_dim=0, w_dim=zdim, img_resolution=res, img_channels=1,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=16384, channel_max=512, num_fp16_res=4),
    )
    d = Discriminator(
        c_dim=0, img_resolution=res, img_channels=1,
        channel_base=16384, channel_max=512, num_fp16_res=4,
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
    cfg = TrainStepConfig(batch_size=batch, z_dim=zdim, ada_target=0.6)
    mesh = create_mesh(1)
    stepper = TrainStepper(loss, opt_g, opt_d, cfg, mesh)
    imgs = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, res, res, 1)), jnp.float32
    )
    zeros_c = jnp.zeros((batch, 0), jnp.float32)

    def run(name, fn, s):
        s2, _ = fn(s, imgs, zeros_c)
        jax.block_until_ready(s2.params_g)
        t0 = time.perf_counter()
        for _ in range(3):
            s2, _ = fn(s2, imgs, zeros_c)
        jax.block_until_ready(s2.params_g)
        print(f"{name:40s} {(time.perf_counter()-t0)/3*1000:9.1f} ms", flush=True)

    # (A) plain jit, collectives stubbed.
    orig_pmean, orig_psum = jax.lax.pmean, jax.lax.psum
    jax.lax.pmean = lambda x, axis_name: x
    jax.lax.psum = lambda x, axis_name: x
    orig_axis_index = jax.lax.axis_index
    jax.lax.axis_index = lambda name: jnp.asarray(0, jnp.int32)
    try:
        fn_a = jax.jit(functools.partial(stepper._device_step, False, False))
        run("plain jit (no shard_map)", fn_a, jax.tree.map(jnp.copy, state))
    finally:
        jax.lax.pmean, jax.lax.psum = orig_pmean, orig_psum
        jax.lax.axis_index = orig_axis_index

    # (B) shard_map + jit, no donation.
    mapped = jax.shard_map(
        functools.partial(stepper._device_step, False, False),
        mesh=mesh, in_specs=(P(), P("data"), P("data")), out_specs=(P(), P()),
        check_vma=False,
    )
    fn_b = jax.jit(mapped)
    run("shard_map jit (no donate)", fn_b, jax.tree.map(jnp.copy, state))

    # (C) current stepper variant (donated).
    fn_c = stepper.get(False, False)
    run("shard_map jit (donate)", fn_c, jax.tree.map(jnp.copy, state))


if __name__ == "__main__":
    main()
