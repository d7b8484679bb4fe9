"""Training state: one pytree dataclass holding everything a step mutates.

Improvement over the reference, whose snapshots carry only module pickles
(``training_loop_mi_multimodal.py:417-434``) and whose resume path drops
optimizer moments / EMA / ADA state (``:199-204``): here the *full* state
(params, both Adam moment sets, G-EMA, pl_mean, ada_p, step counters,
RNG) is checkpointable with orbax, so resume is exact.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class GANTrainState:
    step: jax.Array                   # int32 batch index (reference batch_idx)
    cur_nimg: jax.Array               # int32 images seen (reference cur_nimg)
    params_g: Any
    params_d: Any
    params_g_ema: Any
    emas_g: Any                       # G's 'emas' collection (w_avg; SG3 magnitude_emas)
    consts_g: Any                     # G's static buffer collections (noise consts, SG3 freqs)
    opt_g: optax.OptState
    opt_d: optax.OptState
    pl_mean: jax.Array                # path-length EMA baseline
    ada_p: jax.Array                  # ADA augmentation probability
    ada_signs: jax.Array              # f32[2] = [n, sum(sign(D(real)))] since last ADA update
    rng: jax.Array                    # base PRNG key (folded with step/device)

    @property
    def vars_g(self) -> Dict[str, Any]:
        return {"params": self.params_g, "emas": self.emas_g, **self.consts_g}

    @property
    def vars_g_ema(self) -> Dict[str, Any]:
        return {"params": self.params_g_ema, "emas": self.emas_g, **self.consts_g}

    @property
    def vars_d(self) -> Dict[str, Any]:
        return {"params": self.params_d}


def create_train_state(
    G,
    D,
    rng: jax.Array,
    opt_g: optax.GradientTransformation,
    opt_d: optax.GradientTransformation,
    z_dim: int,
    c_dim: int,
    img_resolution: int,
    img_channels: int,
    init_batch: int = 2,
) -> GANTrainState:
    """Initialise all parameters and optimizer states."""
    k_g, k_d, k_noise, k_state = jax.random.split(rng, 4)
    z = jnp.zeros((init_batch, z_dim), jnp.float32)
    c = jnp.zeros((init_batch, c_dim), jnp.float32) if c_dim > 0 else None
    img = jnp.zeros((init_batch, img_resolution, img_resolution, img_channels), jnp.float32)

    g_vars = G.init({"params": k_g, "noise": k_noise}, z, c)
    d_vars = D.init({"params": k_d}, img, c)

    params_g = g_vars["params"]
    params_d = d_vars["params"]
    consts_g = {
        k: v for k, v in g_vars.items() if k not in ("params", "emas")
    }
    return GANTrainState(
        step=jnp.asarray(0, jnp.int32),
        cur_nimg=jnp.asarray(0, jnp.int32),
        params_g=params_g,
        params_d=params_d,
        # real copy — sharing buffers with params_g breaks donation
        params_g_ema=jax.tree.map(jnp.copy, params_g),
        emas_g=g_vars.get("emas", {}),
        consts_g=consts_g,
        opt_g=opt_g.init(params_g),
        opt_d=opt_d.init(params_d),
        pl_mean=jnp.asarray(0.0, jnp.float32),
        ada_p=jnp.asarray(0.0, jnp.float32),
        ada_signs=jnp.zeros((2,), jnp.float32),
        rng=k_state,
    )


def lazy_reg_adam(
    lr: float, betas=(0.0, 0.99), eps: float = 1e-8, reg_interval: Optional[int] = None
) -> optax.GradientTransformation:
    """Adam with lazy-regularisation LR/beta scaling.

    Reference ``training_loop_mi_multimodal.py:248-255``:
    ``mb_ratio = r/(r+1)``, ``lr *= mb_ratio``, ``beta_i **= mb_ratio``.
    """
    if reg_interval is not None:
        mb_ratio = reg_interval / (reg_interval + 1)
        lr = lr * mb_ratio
        betas = tuple(b**mb_ratio for b in betas)
    tx = optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
    # A/B lever (GANTRACK_FLAT_OPT=1): run Adam over one concatenated
    # vector instead of ~200 small per-leaf fusions.  The ravel/unravel
    # round trip is ~100 MB/step of pure bandwidth; whether that beats the
    # per-fusion launch tail is an empirical question (see docs/ROADMAP.md
    # perf log).  Changes the opt-state pytree, so checkpoints written
    # with the flag differ from ones without.
    import os

    if os.environ.get("GANTRACK_FLAT_OPT", "0") == "1":
        tx = optax.flatten(tx)
    return tx
