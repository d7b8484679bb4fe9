"""Training launcher CLI.

Capability parity with the reference ``train_mi_multimodal.py`` (full
flag surface: cfg presets, data/dtype/modalities/split, batch/gamma,
cond/mirror/aug/ada options, resume, freeze-D, cbase/cmax/glr/dlr/
map-depth/mbstd-group, metrics/kimg/tick/snap/seed, dry-run) — minus the
per-GPU process spawning: on TPU a single controller drives the whole
mesh (``--devices`` replaces ``--gpus``).

Run: ``python -m gantrack_tpu.tools.train --outdir=... --cfg=stylegan2
--data=... --batch=32 --gamma=0.4096 ...``
"""

from __future__ import annotations

import json
import os
from typing import Optional

import click
import jax
import jax.numpy as jnp
import numpy as np


def build_generator_from_cfg(cfg: str, *, resolution: int, channels: int, c_dim: int,
                             cbase: int = 32768, cmax: int = 512,
                             map_depth: Optional[int] = None, fp32: bool = False,
                             z_dim: int = 512, w_dim: int = 512,
                             num_fp16_res: int = 4):
    """Shared G constructor for train/gen/metric tools (reference config
    branching, ``train_mi_multimodal.py:288-306``)."""
    map_depth = map_depth or (8 if cfg == "stylegan2" else 2)
    if fp32:
        num_fp16_res = 0
    if cfg == "stylegan2":
        from ..models.stylegan2 import Generator

        return Generator(
            z_dim=z_dim, c_dim=c_dim, w_dim=w_dim,
            img_resolution=resolution, img_channels=channels,
            mapping_kwargs=dict(num_layers=map_depth),
            synthesis_kwargs=dict(
                channel_base=cbase, channel_max=cmax,
                num_fp16_res=num_fp16_res,
            ),
        )
    from ..models.stylegan3 import Generator as SG3Generator

    mult = 2 if cfg == "stylegan3-r" else 1
    return SG3Generator(
        z_dim=z_dim, c_dim=c_dim, w_dim=w_dim,
        img_resolution=resolution, img_channels=channels,
        channel_base=cbase * mult, channel_max=cmax * mult,
        conv_kernel=1 if cfg == "stylegan3-r" else 3,
        use_radial_filters=(cfg == "stylegan3-r"),
        num_fp16_res=num_fp16_res,
        mapping_kwargs=dict(num_layers=map_depth),
    )


def parse_comma_separated_list(ctx, param, value):
    if value is None or value == "" or value == "none":
        return []
    if isinstance(value, (list, tuple)):
        return list(value)
    return value.split(",")


@click.command()
# Required.
@click.option("--outdir", required=True, metavar="DIR", help="Where to save the results")
@click.option("--cfg", type=click.Choice(["stylegan3-t", "stylegan3-r", "stylegan2"]), required=True)
@click.option("--data", required=True, metavar="[ZIP|DIR]", help="Training data")
@click.option("--dtype", type=str, default="float32", help="Dynamic range of images")
@click.option("--modalities", type=str, default="MR_nonrigid_CT,MR_MR_T2")
@click.option("--dataset", "dataset_name", type=str, default="Pelvis_2.1")
@click.option("--split", type=str, default="train")
@click.option("--metrics_cache", type=bool, default=False)
@click.option("--devices", "--gpus", "num_devices", type=click.IntRange(min=1), default=None,
              help="Number of TPU chips (default: all)")
@click.option("--batch", type=click.IntRange(min=1), required=True, help="Total batch size")
@click.option("--batch-gpu", type=click.IntRange(min=1), default=None,
              help="Per-device micro-batch: gradient accumulation when smaller "
                   "than batch/devices (reference --batch-gpu)")
@click.option("--gamma", type=click.FloatRange(min=0), required=True, help="R1 weight")
# Optional features.
@click.option("--cond", type=bool, default=False)
@click.option("--mirror", type=bool, default=False)
@click.option("--aug", type=click.Choice(["noaug", "ada", "fixed"]), default="ada")
@click.option("--ada_kimg", type=click.IntRange(min=1), default=500)
@click.option("--aug_opts", callback=parse_comma_separated_list,
              default="xflip,xint,scale,rotate,aniso,xfrac")
@click.option("--xint_max", type=click.FloatRange(min=0, max=1), default=0.05)
@click.option("--rotate_max", type=click.IntRange(min=0, max=360), default=3)
@click.option("--xfrac_std", type=click.FloatRange(min=0, max=1), default=0.05)
@click.option("--scale_std", type=click.FloatRange(min=0, max=1), default=0.05)
@click.option("--aniso_std", type=click.FloatRange(min=0, max=1), default=0.05)
@click.option("--resume", type=str, default=None, metavar="[PATH]")
@click.option("--freezed", type=click.IntRange(min=0), default=0)
# Misc hyperparameters.
@click.option("--p", "aug_p", type=click.FloatRange(min=0, max=1), default=0.2)
@click.option("--target", type=click.FloatRange(min=0, max=1), default=0.6)
@click.option("--cbase", type=click.IntRange(min=1), default=32768)
@click.option("--cmax", type=click.IntRange(min=1), default=512)
@click.option("--glr", type=click.FloatRange(min=0), default=None)
@click.option("--dlr", type=click.FloatRange(min=0), default=0.002)
@click.option("--map-depth", type=click.IntRange(min=1), default=None)
@click.option("--mbstd-group", type=click.IntRange(min=1), default=4)
# Misc settings.
@click.option("--desc", type=str, default=None)
@click.option("--metrics", callback=parse_comma_separated_list, default="fid50k_full")
@click.option("--workers", type=click.IntRange(min=1), default=1,
              help="Loader prefetch workers (threads for sharded-memmap, "
                   "spawned processes for zip-pickle — reference "
                   "DataLoader num_workers=3 semantics)")
@click.option("--metric-snap", type=click.IntRange(min=1), default=1,
              help="Evaluate metrics only on every N-th snapshot "
                   "(checkpoints still save every snapshot; skipped "
                   "metrics can be recomputed via tools/analysis.py)")
@click.option("--metric-async", is_flag=True, default=False,
              help="Run snapshot metrics in a background thread while "
                   "training continues (jsonl rows stamped by snapshot "
                   "kimg)")
@click.option("--detector-weights", type=str, default=None,
              help="Converted InceptionV3 weights .npz for FID (see tools/convert_detector.py)")
@click.option("--kimg", type=click.IntRange(min=1), default=25000)
@click.option("--tick", type=click.IntRange(min=1), default=4)
@click.option("--snap", type=click.IntRange(min=1), default=50)
@click.option("--seed", type=click.IntRange(min=0), default=0)
@click.option("--rng-impl", type=click.Choice(["rbg", "threefry"]), default="rbg",
              help="PRNG backend for the train step (rbg = hardware bit-gen)")
@click.option("--fp32", type=bool, default=False, help="Disable bf16 mixed precision")
@click.option("--num-fp16-res", type=click.IntRange(min=0), default=4,
              help="How many top resolutions run in bf16 (reference "
                   "num_fp16_res default 4; 8 = full-bf16 network, a TPU "
                   "throughput option — bf16 keeps f32 exponent range so "
                   "the reference's fp16 range concerns don't apply)")
@click.option("-n", "--dry-run", is_flag=True)
def main(**opts):
    """Train StyleGAN2-ADA / StyleGAN3 on a TPU mesh."""
    from ..data.dataset import open_dataset
    from ..metrics import registry as metric_registry
    from ..parallel.mesh import initialize_distributed
    from ..utils.config import EasyDict, allocate_run_dir, dump_options

    # Multi-host bootstrap (no-op single-host); must precede backend use.
    if initialize_distributed():
        print(f"Distributed: process {jax.process_index()}/{jax.process_count()}")

    opts = EasyDict(opts)
    # Hardware RBG PRNG for the training hot path (threefry bit-gen
    # fusions cost ~7 ms/step across the per-layer noise / style-mixing /
    # augment streams).  Seeded + deterministic per run like the
    # reference's per-rank torch seeding (training_loop:166-167).
    if opts.rng_impl != "threefry":
        jax.config.update("jax_default_prng_impl", opts.rng_impl)

    # ------------------------------------------------------------ config
    c = EasyDict()
    c.cfg = opts.cfg
    c.batch_size = opts.batch
    c.total_kimg = opts.kimg
    c.kimg_per_tick = opts.tick
    c.snapshot_ticks = opts.snap
    c.random_seed = opts.seed
    c.metrics = opts.metrics
    for m in c.metrics:
        if not metric_registry.is_valid_metric(m):
            raise click.ClickException(
                f"unknown metric {m}; valid: {metric_registry.list_valid_metrics()}"
            )

    modalities = opts.modalities.split(",") if opts.modalities else None
    dataset_kwargs = dict(split=opts.split, xflip=opts.mirror, use_labels=opts.cond,
                          random_seed=opts.seed)
    if opts.data.endswith(".zip"):
        dataset_kwargs["modalities"] = modalities

    c.dataset = opts.data
    c.G = EasyDict(
        z_dim=512, w_dim=512,
        channel_base=opts.cbase, channel_max=opts.cmax,
        num_fp16_res=0 if opts.fp32 else opts.num_fp16_res,
        map_depth=opts.map_depth or (8 if opts.cfg == "stylegan2" else 2),
    )
    c.D = EasyDict(
        channel_base=opts.cbase, channel_max=opts.cmax,
        num_fp16_res=0 if opts.fp32 else opts.num_fp16_res,
        mbstd_group=opts.mbstd_group, freezed=opts.freezed,
    )
    c.glr = opts.glr if opts.glr is not None else (0.002 if opts.cfg == "stylegan2" else 0.0025)
    c.dlr = opts.dlr
    c.gamma = opts.gamma
    c.ema_kimg = opts.batch * 10 / 32
    c.aug = opts.aug
    c.target = opts.target

    desc = f"{opts.dataset_name}-{opts.cfg}-batch{opts.batch}-gamma{opts.gamma:g}"
    if opts.desc:
        desc += f"-{opts.desc}"

    if opts.dry_run:
        print(json.dumps(c, indent=2, default=repr))
        print("Dry run; exiting.")
        return

    run_dir = allocate_run_dir(opts.outdir, desc)
    dump_options(run_dir, c)
    print(f"Run dir: {run_dir}")

    train(c, opts, run_dir, dataset_kwargs)


def train(c, opts, run_dir, dataset_kwargs):
    from ..data.dataset import open_dataset
    from ..data.loader import InfiniteLoader
    from ..models.stylegan2 import Discriminator, Generator, discriminator_freeze_mask
    from ..parallel.mesh import create_mesh
    from ..training import (
        StyleGAN2Loss, StyleGAN2LossConfig, TrainStepConfig, TrainStepper,
        create_train_state, lazy_reg_adam,
    )
    from ..training.augment import AugmentConfig, AugmentPipe
    from ..training.loop import training_loop
    from ..metrics import MetricOptions, calc_metric, make_inception_detector, report_metric
    from ..metrics.metric_utils import auto_metric_batch
    from ..utils.checkpoint import load_checkpoint, resolve_checkpoint_path
    import optax

    dataset = open_dataset(opts.data, **dataset_kwargs)
    res = dataset.resolution
    channels = dataset.num_channels
    if opts.cond and not dataset.has_labels:
        raise click.ClickException(
            "--cond=True requires labels specified in dataset.json"
        )
    c_dim = dataset.label_dim if opts.cond else 0
    print(f"Dataset: {dataset.name}  {len(dataset)} items  {res}x{res}x{channels}  labels={c_dim}")

    g = build_generator_from_cfg(
        opts.cfg, resolution=res, channels=channels, c_dim=c_dim,
        cbase=c.G.channel_base, cmax=c.G.channel_max,
        map_depth=c.G.map_depth, num_fp16_res=c.G.num_fp16_res,
        z_dim=c.G.z_dim, w_dim=c.G.w_dim,
    )
    d = Discriminator(
        c_dim=c_dim, img_resolution=res, img_channels=channels,
        channel_base=c.D.channel_base, channel_max=c.D.channel_max,
        num_fp16_res=c.D.num_fp16_res,
        epilogue_kwargs=dict(mbstd_group_size=c.D.mbstd_group),
    )

    # Optimizers with lazy-reg scaling; freeze-D via mask.
    g_reg_interval = 4 if opts.cfg == "stylegan2" else None
    d_reg_interval = 16
    opt_g = lazy_reg_adam(c.glr, reg_interval=g_reg_interval)
    opt_d = lazy_reg_adam(c.dlr, reg_interval=d_reg_interval)
    if opts.freezed > 0:
        # Freeze the first N D layers (top resolution inward), reference
        # ``networks_stylegan2.py:583-590`` freeze_layers semantics.
        opt_d = optax.masked(
            opt_d,
            lambda params: discriminator_freeze_mask(
                params, opts.freezed, d.block_resolutions, architecture="resnet"
            ),
        )

    mesh = create_mesh(opts.num_devices)
    print(f"Mesh: {mesh.devices.size} devices")

    if jax.process_index() == 0:
        # Startup network tables (reference misc.print_module_summary,
        # training_loop:186-192).
        from ..utils.summary import print_module_summary

        z0 = jnp.zeros((1, c.G.z_dim))
        c0 = jnp.zeros((1, c_dim)) if c_dim > 0 else None
        print_module_summary(
            g, z0, c0, rngs={"params": jax.random.PRNGKey(0),
                             "noise": jax.random.PRNGKey(1)}, depth=2)
        print_module_summary(
            d, jnp.zeros((1, res, res, channels)), c0, depth=2)

    state = create_train_state(
        g, d, jax.random.PRNGKey(opts.seed), opt_g, opt_d,
        z_dim=c.G.z_dim, c_dim=c_dim, img_resolution=res, img_channels=channels,
    )
    if opts.resume:
        if opts.resume.endswith((".pkl", ".pickle")):
            # Reference network-snapshot pickle: weight transplant, fresh
            # optimizer (reference resume semantics, legacy.py:22-59).
            from ..models.torch_compat import (
                load_network_pickle, transplant_into_state,
            )

            print(f"Resuming from reference pickle {opts.resume}")
            state = transplant_into_state(
                state, *load_network_pickle(opts.resume))
        else:
            path = resolve_checkpoint_path(opts.resume)
            if path is None:
                raise click.ClickException(
                    f"--resume: no checkpoint found under {opts.resume}")
            print(f"Resuming from {path}")
            state = load_checkpoint(path, state)

    augment_fn = None
    ada_target = None
    if opts.aug != "noaug":
        aug_cfg = AugmentConfig(**{
            **{k: 1.0 for k in opts.aug_opts},
            "xint_max": opts.xint_max,
            "rotate_max": opts.rotate_max / 360,
            "xfrac_std": opts.xfrac_std,
            "scale_std": opts.scale_std,
            "aniso_std": opts.aniso_std,
        })
        augment_fn = AugmentPipe(aug_cfg, res, res, channels)
        if opts.aug == "ada":
            ada_target = opts.target
        else:
            state = state.replace(ada_p=jnp.asarray(opts.aug_p, jnp.float32))

    loss = StyleGAN2Loss(
        g, d,
        StyleGAN2LossConfig(
            r1_gamma=c.gamma,
            style_mixing_prob=0.9 if opts.cfg == "stylegan2" else 0.0,
            pl_weight=2.0 if opts.cfg == "stylegan2" else 0.0,
            blur_init_sigma=10.0 if opts.cfg == "stylegan3-r" else 0.0,
            blur_fade_kimg=opts.batch * 200 / 32 if opts.cfg == "stylegan3-r" else 0.0,
        ),
        augment_fn=augment_fn,
    )
    micro_batches = 1
    if opts.batch_gpu is not None:
        local_b = opts.batch // int(mesh.devices.size)
        if local_b % opts.batch_gpu != 0:
            raise click.ClickException(
                f"--batch-gpu {opts.batch_gpu} must divide the per-device "
                f"batch {local_b} (batch {opts.batch} / {mesh.devices.size} devices)")
        micro_batches = local_b // opts.batch_gpu
    step_cfg = TrainStepConfig(
        batch_size=opts.batch, z_dim=c.G.z_dim, c_dim=c_dim,
        micro_batches=micro_batches,
        ema_kimg=c.ema_kimg, ema_rampup=None if opts.resume else 0.05,
        g_reg_interval=g_reg_interval, d_reg_interval=d_reg_interval,
        ada_target=ada_target,
        ada_kimg=100 if opts.resume else opts.ada_kimg,
    )
    label_bank = None
    if c_dim > 0:
        # Gen-pass labels follow the dataset's empirical distribution
        # (reference training_loop:319-321).
        label_bank = np.stack(
            [dataset.get_label(i) for i in range(len(dataset))]
        ).astype(np.float32)
    stepper = TrainStepper(loss, opt_g, opt_d, step_cfg, mesh,
                           label_bank=label_bank)

    # Each host loads only its shard of the global batch; the index stream
    # strides by process (reference InfiniteSampler rank semantics) and
    # shard_batch assembles the global array from the local rows.
    assert opts.batch % jax.process_count() == 0, (opts.batch, jax.process_count())
    loader = InfiniteLoader(
        dataset, batch_size=opts.batch // jax.process_count(),
        rank=jax.process_index(), num_replicas=jax.process_count(),
        seed=opts.seed,
        num_workers=opts.workers,
        # zip-pickle decodes hold the GIL (threads scale negatively,
        # docs/SCALING.md) — use spawned worker processes there, like the
        # reference's 3-process torch DataLoader; the sharded-memmap
        # C++ gather releases the GIL, where threads are zero-copy.
        worker_mode=("process" if opts.workers > 1
                     and not hasattr(dataset, "gather_batch") else "thread"),
    )

    # EMA sampling for image grids.
    @jax.jit
    def _sample(vars_g_ema, z, cl):
        return g.apply(vars_g_ema, z, cl if c_dim > 0 else None, noise_mode="const")

    def sample_fn(state, grid_z, grid_c):
        outs = []
        for i in range(0, len(grid_z), opts.batch):
            z = jnp.asarray(grid_z[i : i + opts.batch])
            cl = jnp.asarray(grid_c[i : i + opts.batch])
            outs.append(np.asarray(_sample(state.vars_g_ema, z, cl)))
        return np.concatenate(outs)

    # Metric evaluation per snapshot.
    detector = None
    if c.metrics:
        detector = make_inception_detector(opts.detector_weights, seed=0)

    def metric_fn(state, kimg=None):
        @jax.jit
        def gen(z, cl):
            return g.apply(state.vars_g_ema, z, cl if c_dim > 0 else None, noise_mode="const")

        @jax.jit
        def map_fn(z, cl):
            return g.apply(
                state.vars_g_ema, z, cl if c_dim > 0 else None,
                method=lambda m, z_, c_: m.mapping(z_, c_),
            )

        @jax.jit
        def syn_fn(ws):
            return g.apply(
                state.vars_g_ema, ws, noise_mode="const", method="map_then_synthesize"
            )

        results = {}
        modes = (
            [(None, None)] if channels != 2
            else [(m, i) for i, m in enumerate(opts.modalities.split(","))]
        )
        for mode_name, mode_idx in modes:
            mopts = MetricOptions(
                generator=lambda z, cl: gen(z, cl),
                mapping=lambda z, cl: map_fn(z, cl),
                synthesis=lambda ws: syn_fn(ws),
                z_dim=c.G.z_dim, c_dim=c_dim, dataset=dataset, detector=detector,
                mode_idx=mode_idx,
                batch_size=auto_metric_batch(res),
                cache_dir=os.path.join(run_dir, "metric-cache") if opts.metrics_cache else None,
                mesh=mesh if mesh.devices.size > 1 else None,
            )
            for m in c.metrics:
                rd = calc_metric(m, mopts, mode_name=mode_name)
                report_metric(rd, run_dir=run_dir, kimg=kimg)
                results.update({f"{mode_name or ''}{k}": v for k, v in rd["results"].items()})
        return results

    from ..utils.notify import notify

    try:
        training_loop(
            run_dir=run_dir,
            stepper=stepper,
            state=state,
            loader=loader,
            mesh=mesh,
            total_kimg=c.total_kimg,
            kimg_per_tick=c.kimg_per_tick,
            snapshot_ticks=c.snapshot_ticks,
            image_snapshot_ticks=c.snapshot_ticks,
            metrics=c.metrics,
            metric_fn=metric_fn if c.metrics else None,
            metric_snapshot_every=opts.metric_snap,
            metric_async=opts.metric_async,
            sample_fn=sample_fn,
        )
    except BaseException as e:
        # Failure notification (reference notification_ifttt at run
        # milestones, util_general.py:76-79); best-effort, never masks.
        notify(f"Training FAILED in {run_dir}: {type(e).__name__}: {e}")
        raise
    notify(f"Training complete: {run_dir}")


if __name__ == "__main__":
    main()
