"""Standalone metric evaluation CLI.

Capability parity with the reference ``calc_metrics_mi_multimodal.py``:
load a checkpoint, loop requested metrics × modalities, write
``metric-<mode>-<metric>.jsonl`` next to the checkpoint.
"""

from __future__ import annotations

import os
from typing import Optional

import click


@click.command()
@click.option("--network", "checkpoint", required=True, help="Checkpoint path or run dir")
@click.option("--metrics", default="fid10k", help="Comma-separated metric names")
@click.option("--data", required=True, help="Dataset path (zip or shard dir)")
@click.option("--split", default="train")
@click.option("--modalities", default=None, help="Comma-separated (multimodal zips)")
@click.option("--mirror", type=bool, default=False)
@click.option("--detector-weights", type=str, default=None)
@click.option("--cache-dir", type=str, default=None)
@click.option("--resolution", type=int, default=256)
@click.option("--channels", type=int, default=1)
@click.option("--cfg", type=click.Choice(["stylegan2", "stylegan3-t", "stylegan3-r"]),
              default="stylegan2")
@click.option("--cbase", type=int, default=32768)
@click.option("--cmax", type=int, default=512)
@click.option("--map-depth", type=int, default=None)
@click.option("--batch", type=int, default=None,
              help="Extraction batch (default: resolution-scaled, 256 at <=256²)")
@click.option("--cond", type=bool, default=False,
              help="Conditional checkpoint: rebuild G with the dataset's label_dim")
def main(checkpoint, metrics, data, split, modalities, mirror, detector_weights,
         cache_dir, resolution, channels, cfg, cbase, cmax, map_depth, batch, cond):
    """Evaluate quality metrics for a trained checkpoint."""
    import jax
    import jax.numpy as jnp

    from ..data.dataset import open_dataset
    from ..metrics import MetricOptions, calc_metric, make_inception_detector, report_metric
    from ..metrics.registry import is_valid_metric, list_valid_metrics
    from ..utils.checkpoint import resolve_network
    from .train import build_generator_from_cfg

    metric_list = [m for m in metrics.split(",") if m]
    for m in metric_list:
        if not is_valid_metric(m):
            raise click.ClickException(f"unknown metric {m}; valid: {list_valid_metrics()}")

    mod_list = modalities.split(",") if modalities else None
    kwargs = dict(split=split, xflip=mirror)
    if data.endswith(".zip") and mod_list:
        kwargs["modalities"] = mod_list
    dataset = open_dataset(data, **kwargs)

    c_dim = 0
    if cond:
        if not dataset.has_labels:
            raise click.ClickException("--cond requires a labelled dataset")
        c_dim = dataset.label_dim
    g = build_generator_from_cfg(
        cfg, resolution=dataset.resolution, channels=dataset.num_channels,
        c_dim=c_dim, cbase=cbase, cmax=cmax, map_depth=map_depth,
    )
    state, path = resolve_network(checkpoint)
    if state is None:
        raise click.ClickException(f"no checkpoint found under {checkpoint}")
    run_dir = (os.path.dirname(os.path.dirname(path))
               if not path.endswith((".pkl", ".pickle")) else None)
    print(f"Loading {path}")
    vars_g = {
        "params": state["params_g_ema"],
        "emas": state["emas_g"],
        **state["consts_g"],
    }

    @jax.jit
    def gen(z, c):
        return g.apply(vars_g, z, c, noise_mode="const")

    def gen_with_transform(z, c, transform_3x3):
        """SG3 equivariance hook: inject the user transform into the
        synthesis input (reference gen_images.py:122-126 mechanism)."""
        import numpy as np_

        v = jax.tree.map(lambda a: a, vars_g)
        consts = dict(v.get("consts", {}))
        syn = dict(consts.get("synthesis", {}))
        inp = dict(syn.get("input", {}))
        if not inp:
            raise RuntimeError("equivariance metrics require a StyleGAN3 generator")
        inp["transform"] = jnp.asarray(np_.linalg.inv(transform_3x3), jnp.float32)
        syn["input"] = inp
        consts["synthesis"] = syn
        v["consts"] = consts
        return g.apply(v, z, c)

    from ..parallel.mesh import create_mesh

    mesh = create_mesh()
    if mesh.devices.size > 1:
        print(f"Sharding metric extraction over {mesh.devices.size} devices")
    if batch is None:
        from ..metrics.metric_utils import auto_metric_batch

        batch = auto_metric_batch(dataset.resolution)
    detector = make_inception_detector(detector_weights)
    modes = (
        [(None, None)] if dataset.num_channels != 2
        else [(m, i) for i, m in enumerate(mod_list or ["mode0", "mode1"])]
    )
    for mode_name, mode_idx in modes:
        opts = MetricOptions(
            generator=lambda z, c: gen(z, c),
            z_dim=g.z_dim, c_dim=c_dim, dataset=dataset, detector=detector,
            mode_idx=mode_idx, batch_size=batch, cache_dir=cache_dir,
            mesh=mesh if mesh.devices.size > 1 else None,
        )
        opts.generator_with_transform = gen_with_transform
        for m in metric_list:
            rd = calc_metric(m, opts, mode_name=mode_name)
            report_metric(rd, run_dir=run_dir, snapshot_path=path)


if __name__ == "__main__":
    main()
