"""Latent-space projection (GAN inversion).

Capability parity with the reference ``genlib/projector/projector.py:54-387``
and ``genlib/projector/projection_loop.py:11-197``: optimise ``w`` *and the
per-layer noise buffers* with Adam under a cosine LR ramp with initial
w-noise annealing, per-modality VGG16-LPIPS perceptual loss + pixel MSE
(``w_pix``), pyramid noise regularisation at weight ``regularize_noise_weight``
with per-step noise renormalisation, early stopping, and the per-slice
dataset projection loop with smooth per-patient restarts.

TPU-native: the entire optimisation step (G synthesis + VGG features +
losses + Adam update + noise renormalisation) is one jitted function;
steps run back-to-back on device with only the scalar loss fetched per
step (needed for the reference's early-stopping rule).
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass
class ProjectorConfig:
    """Defaults mirror the reference (``projector.py:54-105``)."""

    num_steps: int = 1000
    w_avg_samples: int = 10000
    initial_learning_rate: float = 0.1
    initial_noise_factor: float = 0.05
    lr_rampdown_length: float = 0.25
    lr_rampup_length: float = 0.05
    noise_ramp_length: float = 0.75
    regularize_noise_weight: float = 1e5
    w_pix_weight: float = 0.01       # reference ``w_pix``
    w_lpips_weight: float = 1.0      # reference ``w_lpips``
    early_stopping: int = 1000000    # steps without improvement before stop
    optimize_noise: bool = True
    seed: int = 303


def compute_w_stats(g, vars_g, z_dim: int, num_samples: int, seed: int = 123
                    ) -> Tuple[jnp.ndarray, float]:
    """Mean and std of w over mapping samples (reference ``:157-162``)."""
    z = jax.random.normal(jax.random.PRNGKey(seed), (num_samples, z_dim))

    @jax.jit
    def mapping(z):
        return g.apply(vars_g, z, None, method=lambda m, z, c: m.mapping(z, c))

    ws = np.asarray(mapping(z))[:, :1, :]  # [N, 1, w_dim]
    w_avg = np.mean(ws, axis=0, keepdims=True)  # [1, 1, w_dim]
    w_std = float(np.sqrt(np.sum(np.square(ws - w_avg)) / num_samples))
    return jnp.asarray(w_avg), w_std


def lr_schedule(step: jnp.ndarray, cfg: ProjectorConfig) -> jnp.ndarray:
    """Cosine rampdown with linear rampup (reference ``:203-210``)."""
    t = step / cfg.num_steps
    lr_ramp = jnp.minimum(1.0, (1.0 - t) / cfg.lr_rampdown_length)
    lr_ramp = 0.5 - 0.5 * jnp.cos(lr_ramp * np.pi)
    lr_ramp = lr_ramp * jnp.minimum(1.0, t / cfg.lr_rampup_length)
    return cfg.initial_learning_rate * lr_ramp


def _noise_reg(buf: jnp.ndarray) -> jnp.ndarray:
    """Pyramid shift-correlation regulariser (reference ``:260-268``).

    ``Σ_levels mean(n·roll(n,1,x))² + mean(n·roll(n,1,y))²`` with 2×2
    average pooling between levels until the map is ≤8 wide.
    """
    n = buf.astype(jnp.float32)
    reg = jnp.zeros((), jnp.float32)
    while True:
        reg += jnp.mean(n * jnp.roll(n, 1, axis=1)) ** 2
        reg += jnp.mean(n * jnp.roll(n, 1, axis=0)) ** 2
        if n.shape[0] <= 8:
            break
        h, w = n.shape
        n = n.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    return reg


def _renorm_noise(buf: jnp.ndarray) -> jnp.ndarray:
    """Zero-mean, unit-RMS (reference ``:294-298``)."""
    buf = buf - jnp.mean(buf)
    return buf * jax.lax.rsqrt(jnp.mean(jnp.square(buf)) + 1e-20)


def _to_modalities(img255: jnp.ndarray) -> List[jnp.ndarray]:
    """[1,H,W,C] 0..255 → per-modality 3-channel tensors (``:133-146``)."""
    c = img255.shape[-1]
    if c == 3:
        return [img255]
    return [jnp.repeat(img255[..., ci : ci + 1], 3, axis=-1) for ci in range(c)]


def project(
    g,
    vars_g,
    target: np.ndarray,           # [H, W, C] in [-1, 1]
    feature_fn: Optional[Callable] = None,   # images(0..255, NHWC3) -> features
    cfg: ProjectorConfig = ProjectorConfig(),
    w_init: Optional[np.ndarray] = None,      # [num_ws, w_dim] smooth restart
    verbose: bool = False,
) -> Dict[str, np.ndarray]:
    """Optimise (w, noise buffers) so G(w) matches ``target``.

    Returns dict with ``w`` [num_ws, w_dim] (at ``best_step``),
    ``w_history`` [num_steps, 1, w_dim] (every step, reference ``w_out``),
    ``losses``/``pix_losses``/``lpips_losses``/``reg_losses``, and
    ``best_step``.
    """
    z_dim = g.z_dim
    num_ws = getattr(g, "num_ws", None) or g.apply(
        vars_g, jnp.zeros((1, z_dim)), None,
        method=lambda m, z, c: m.mapping(z, c),
    ).shape[1]
    if w_init is not None:
        # Reference ``:152-156``: w_avg := w_init[:1], w_std := std(w_init[:1]).
        w_sample = jnp.asarray(w_init, jnp.float32)[None]     # [1, num_ws, w_dim]
        w_avg = w_sample[:, :1, :]
        w_std = float(jnp.std(w_avg))
    else:
        w_avg, w_std = compute_w_stats(g, vars_g, z_dim, cfg.w_avg_samples)

    # 0..255 loss scale, as the reference (targets arrive 0..255 there).
    target255 = jnp.clip((jnp.asarray(target)[None] + 1) * 127.5, 0, 255)
    target_modes = _to_modalities(target255)
    target_feats = (
        [feature_fn(m) for m in target_modes] if feature_fn is not None else None
    )

    # Noise buffers (reference ``:165-167,191-194``): random-init, optimised.
    noise0 = vars_g.get("noise_consts")
    optimize_noise = cfg.optimize_noise and noise0 is not None
    if optimize_noise:
        leaves, treedef = jax.tree.flatten(noise0)
        keys = jax.random.split(jax.random.PRNGKey(cfg.seed + 1), len(leaves))
        noise0 = jax.tree.unflatten(
            treedef,
            [jax.random.normal(k, l.shape, jnp.float32) for k, l in zip(keys, leaves)],
        )

    other_vars = {k: v for k, v in vars_g.items() if k != "noise_consts"}

    def synth(w, noise):
        ws = jnp.broadcast_to(w, (1, num_ws, w.shape[-1]))
        variables = dict(other_vars)
        if noise is not None:
            variables["noise_consts"] = noise
        elif "noise_consts" in vars_g:
            variables["noise_consts"] = vars_g["noise_consts"]
        return g.apply(
            variables, ws, noise_mode="const",
            method=lambda m, ws, **kw: m.synthesis(ws, **kw),
        )

    def loss_fn(opt_vars, step, rng):
        w, noise = opt_vars
        w_noise_scale = (
            w_std * cfg.initial_noise_factor
            * jnp.square(jnp.maximum(0.0, 1.0 - step / (cfg.num_steps * cfg.noise_ramp_length)))
        )
        w_noisy = w + jax.random.normal(rng, w.shape) * w_noise_scale
        img = synth(w_noisy[0], noise)
        img255 = (img + 1) * (255 / 2)
        synth_modes = _to_modalities(img255)
        pix = jnp.zeros((), jnp.float32)
        lpips = jnp.zeros((), jnp.float32)
        for mi, sm in enumerate(synth_modes):
            pix += jnp.mean(jnp.square(target_modes[mi] - sm))
            if target_feats is not None:
                f_gen = feature_fn(sm)
                lpips += jnp.sum(jnp.square(f_gen - target_feats[mi]))
        reg = jnp.zeros((), jnp.float32)
        if noise is not None:
            reg = sum(_noise_reg(b) for b in jax.tree.leaves(noise))
        loss = (cfg.w_pix_weight * pix + cfg.w_lpips_weight * lpips
                + cfg.regularize_noise_weight * reg)
        return loss, (pix, lpips, reg)

    opt = optax.adam(lambda count: lr_schedule(count, cfg), b1=0.9, b2=0.999)

    @jax.jit
    def step_fn(opt_vars, opt_state, step, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            opt_vars, step, rng)
        updates, opt_state = opt.update(grads, opt_state, opt_vars)
        w, noise = optax.apply_updates(opt_vars, updates)
        if noise is not None:
            noise = jax.tree.map(_renorm_noise, noise)
        return (w, noise), opt_state, loss, aux

    opt_vars = (jnp.asarray(w_avg), noise0 if optimize_noise else None)
    opt_state = opt.init(opt_vars)
    rng = jax.random.PRNGKey(cfg.seed)
    losses, pixes, lpipses, regs = [], [], [], []
    w_out = np.zeros((cfg.num_steps, 1, w_avg.shape[-1]), np.float32)
    best_loss, best_step, steps_no_improve = np.inf, cfg.num_steps - 1, 0
    for i in range(cfg.num_steps):
        rng, k = jax.random.split(rng)
        opt_vars, opt_state, loss, (pix, lpips, reg) = step_fn(
            opt_vars, opt_state, jnp.asarray(i, jnp.float32), k)
        loss = float(loss)
        if verbose and i % 100 == 0:
            print(f"step {i:4d}: loss {loss:.4f} pix {float(pix):.4f} "
                  f"lpips {float(lpips):.4f} reg {float(reg):.3e}")
        losses.append(loss)
        pixes.append(float(pix))
        lpipses.append(float(lpips))
        regs.append(float(reg) * cfg.regularize_noise_weight)
        w_out[i] = np.asarray(opt_vars[0][0])
        # Early stopping (reference ``:300-312``).
        if loss < best_loss:
            best_loss, best_step, steps_no_improve = loss, i, 0
        else:
            steps_no_improve += 1
            if steps_no_improve >= cfg.early_stopping:
                if verbose:
                    print(f"Early stopping at step {i}")
                w_out = w_out[: i + 1]
                break

    w_final = np.broadcast_to(w_out[best_step], (num_ws, w_avg.shape[-1]))
    return {
        "w": np.array(w_final),
        "w_history": w_out,
        "losses": np.asarray(losses),
        "pix_losses": np.asarray(pixes),
        "lpips_losses": np.asarray(lpipses),
        "reg_losses": np.asarray(regs),
        "best_step": best_step,
        "noise": (jax.tree.map(np.asarray, opt_vars[1])
                  if opt_vars[1] is not None else None),
    }


# --------------------------------------------------------------- loop CLI


def _split_ids(fname: str, idx: int) -> Tuple[str, int]:
    """Patient/slice ids from an item name (reference ``projection_loop.py:68-70``
    parses ``<patient>/.../<slice>.ext`` paths and ``<patient>_<slice>`` stems)."""
    parts = fname.replace("\\", "/").split("/")
    stem = os.path.splitext(parts[-1])[0]
    if len(parts) >= 2:
        patient = parts[-2] if parts[-2] else parts[0]
        tail = stem[-5:]
        return patient, int(tail) if tail.isdigit() else idx
    if "_" in stem:
        patient, tail = stem.rsplit("_", 1)
        if tail.isdigit():
            return patient, int(tail)
    return stem, idx


def projection_loop(
    g,
    vars_g,
    dataset,
    run_dir: str,
    cfg: ProjectorConfig = ProjectorConfig(),
    feature_fn: Optional[Callable] = None,
    step_patient_slice: int = 1,
    snap_image: int = 1,
    snap_history: int = 1,
    modalities: Optional[List[str]] = None,
    verbose: bool = True,
    max_items: Optional[int] = None,
    first_slice_steps: int = 1000,   # reference hardcodes 1000 / no early stop
) -> Dict[str, Dict[int, np.ndarray]]:
    """Project every ``step_patient_slice``-th dataset slice.

    Reference ``projection_loop.py:57-97``: the first slice of each patient
    runs 1000 steps with no early stopping; subsequent slices smooth-restart
    from the previous best w with the configured budget.  Writes per-slice
    ``w_*.npz``, target|synth PNG pairs, loss CSVs, and the final
    ``projected_w`` pickle (patient → slice → w).
    """
    os.makedirs(run_dir, exist_ok=True)
    modalities = modalities or [f"M{i}" for i in range(int(dataset.num_channels))]
    projected: Dict[str, Dict[int, np.ndarray]] = {}
    current_patient, w_init = None, None
    n = len(dataset) if max_items is None else min(len(dataset), max_items)
    for idx in range(n):
        if idx % step_patient_slice != 0:
            continue
        image, _, fname = dataset[idx]
        patient, slice_id = _split_ids(str(fname), idx)
        # GANDataset.__getitem__ yields raw dynamic-range pixels (0..255 floats
        # or uint8, like the reference dataset); the training loader applies
        # /127.5-1 separately (loader.py), so normalize here before projecting
        # (reference projection_loop.py feeds 0..255 into a projector that
        # rescales internally).
        target = np.asarray(image, np.float32) / 127.5 - 1.0  # [H, W, C] -> [-1, 1]
        if verbose:
            print(f"Patient: {patient}  slice: {slice_id}")
        if patient == current_patient and w_init is not None:
            result = project(g, vars_g, target, feature_fn=feature_fn, cfg=cfg,
                             w_init=w_init, verbose=verbose)
        else:
            first_cfg = dataclasses.replace(cfg, num_steps=first_slice_steps,
                                            early_stopping=1000000)
            result = project(g, vars_g, target, feature_fn=feature_fn,
                             cfg=first_cfg, verbose=verbose)
            current_patient = patient
        w_init = result["w"]
        projected.setdefault(patient, {})[slice_id] = result["w"]
        _write_slice_artifacts(g, vars_g, run_dir, patient, slice_id, target,
                               result, modalities, snap_image, snap_history)
    with open(os.path.join(run_dir, "projected_w"), "wb") as f:
        pickle.dump(projected, f, protocol=pickle.HIGHEST_PROTOCOL)
    return projected


def _write_slice_artifacts(g, vars_g, run_dir, patient, slice_id, target,
                           result, modalities, snap_image, snap_history):
    """Reference artifact set (``projector.py:318-344,348-368``)."""
    import PIL.Image

    best = result["best_step"]
    proj_dir = os.path.join(run_dir, patient, "projections")
    os.makedirs(proj_dir, exist_ok=True)
    np.savez(os.path.join(proj_dir, f"w_{slice_id:05d}-best_step_{best}.npz"),
             w=result["w"][None])

    ws = jnp.asarray(result["w"])[None]
    synth = g.apply(vars_g, ws, noise_mode="const",
                    method=lambda m, ws, **kw: m.synthesis(ws, **kw))
    synth255 = np.clip((np.asarray(synth[0]) + 1) * 127.5, 0, 255).astype(np.uint8)
    target255 = np.clip((target + 1) * 127.5, 0, 255).astype(np.uint8)
    if slice_id % snap_image == 0:
        for mi, mode in enumerate(modalities):
            img_dir = os.path.join(run_dir, patient, mode, "image_log")
            os.makedirs(img_dir, exist_ok=True)
            pair = np.concatenate([target255[..., mi], synth255[..., mi]], axis=1)
            PIL.Image.fromarray(pair).save(
                os.path.join(img_dir, f"img_{slice_id:05d}-best_step_{best}.png"))
    if slice_id % snap_history == 0:
        loss_dir = os.path.join(run_dir, patient, "loss")
        os.makedirs(loss_dir, exist_ok=True)
        with open(os.path.join(loss_dir, f"opt_loss_{slice_id:05d}.csv"), "w") as f:
            f.write("step,tot_loss,pix_loss,lpips_loss,reg_loss\n")
            for i in range(len(result["losses"])):
                f.write(f"{i},{result['losses'][i]},{result['pix_losses'][i]},"
                        f"{result['lpips_losses'][i]},{result['reg_losses'][i]}\n")


def main():
    import click

    @click.command()
    @click.option("--network", required=True, help="Run dir or checkpoint path")
    @click.option("--data", required=True, help="Dataset path")
    @click.option("--split", default="train")
    @click.option("--outdir", required=True)
    @click.option("--num-steps", default=1000, type=int)
    @click.option("--early-stopping", default=1000000, type=int)
    @click.option("--w-pix", default=0.01, type=float)
    @click.option("--w-lpips", default=1.0, type=float)
    @click.option("--step-patient-slice", default=1, type=int)
    @click.option("--max-items", default=None, type=int)
    @click.option("--vgg-weights", default=None, help="Converted VGG16 .npz for LPIPS")
    @click.option("--resolution", default=256, type=int)
    @click.option("--channels", default=1, type=int)
    @click.option("--cfg", "g_cfg", default="stylegan2",
                  type=click.Choice(["stylegan2", "stylegan3-t", "stylegan3-r"]))
    @click.option("--cbase", default=32768, type=int)
    @click.option("--cmax", default=512, type=int)
    @click.option("--optimize-noise/--no-optimize-noise", default=True)
    def cli(network, data, split, outdir, num_steps, early_stopping, w_pix,
            w_lpips, step_patient_slice, max_items, vgg_weights, resolution,
            channels, g_cfg, cbase, cmax, optimize_noise):
        from ..data.dataset import open_dataset
        from ..utils.checkpoint import resolve_network
        from .train import build_generator_from_cfg

        g = build_generator_from_cfg(
            g_cfg, resolution=resolution, channels=channels, c_dim=0,
            cbase=cbase, cmax=cmax)
        state, path = resolve_network(network)
        if state is None:
            raise click.ClickException(f"no checkpoint found under {network}")
        vars_g = {"params": state["params_g_ema"], "emas": state["emas_g"],
                  **state["consts_g"]}
        dataset = open_dataset(data, split=split)
        feature_fn = None
        if vgg_weights:
            from ..models.vgg import VGG16, load_npz, lpips_features
            vp = load_npz(vgg_weights)
            model = VGG16()
            feature_fn = jax.jit(lambda x: lpips_features(model, vp, x))
        cfg = ProjectorConfig(
            num_steps=num_steps, early_stopping=early_stopping,
            w_pix_weight=w_pix, w_lpips_weight=w_lpips,
            optimize_noise=optimize_noise)
        projection_loop(g, vars_g, dataset, outdir, cfg=cfg,
                        feature_fn=feature_fn,
                        step_patient_slice=step_patient_slice,
                        max_items=max_items)

    cli()


if __name__ == "__main__":
    main()
