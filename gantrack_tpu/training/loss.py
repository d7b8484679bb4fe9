"""StyleGAN2-ADA adversarial loss phases.

Capability parity with the reference ``training/loss.py:23-139``:
non-saturating softplus losses, style-mixing regularisation, path-length
regularisation with EMA baseline, R1 gradient penalty, discriminator
blur ramp hook, and ADA augmentation insertion before D.

TPU-native notes:
* Every phase is a pure function ``params -> (scalar loss, aux)`` suitable
  for ``jax.grad``; the R1/PL double-backward is plain nested autodiff.
* The reference's ``no_weight_gradients`` trick (``loss.py:90,131``) is
  implicit: ``jax.grad`` w.r.t. ``ws``/images never materialises weight
  cotangents.
* Style mixing uses a shape-static mask instead of in-place slicing.
* ``pl_mean`` is explicit state threaded through (reference keeps it as a
  module buffer).
* All statistics are returned as moment dicts (see ``stats.py``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.upfirdn2d import filter2d
from . import stats


@dataclasses.dataclass(frozen=True)
class StyleGAN2LossConfig:
    """Hyper-parameters (reference ``loss.py:24-41`` defaults as wired by
    ``train_mi_multimodal.py:249-306``)."""

    r1_gamma: float = 10.0
    style_mixing_prob: float = 0.9
    pl_weight: float = 2.0
    pl_batch_shrink: int = 2
    pl_decay: float = 0.01
    blur_init_sigma: float = 0.0
    blur_fade_kimg: float = 0.0
    noise_mode: str = "random"   # synthesis noise; "const" for the
    #   mesh-size-invariance tests (per-layer random noise is drawn with
    #   batch-shaped keys and cannot be made device-count independent)


# augment_fn(images, p, rng) -> images
AugmentFn = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]

# Rematerialisation knobs for the double-backward phases (perf A/B,
# measured via bench.py env flags): "1" = full jax.checkpoint around the
# inner function (recompute residuals in the outer backward), "dots" =
# keep only MXU outputs (checkpoint_dots policy), unset/"0" = off.
_R1_REMAT = os.environ.get("GANTRACK_R1_REMAT", "0")
_PL_REMAT = os.environ.get("GANTRACK_PL_REMAT", "0")


def _maybe_remat(fn, flag: str):
    if flag == "1":
        return jax.checkpoint(fn)
    if flag == "dots":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.checkpoint_dots)
    return fn


def per_sample_normal(key, sample_idx, shape_tail, dtype=jnp.float32):
    """Draw one normal of shape ``shape_tail`` per sample, keyed by the
    sample's *global* index — mesh-size-independent randomness used by the
    ``rng_mode='global_sample'`` invariance tests (replaces the
    reference's ``check_ddp_consistency``, ``torch_utils/misc.py:180-191``,
    with a numeric 1-dev == N-dev equality check)."""
    return jax.vmap(
        lambda i: jax.random.normal(jax.random.fold_in(key, i), shape_tail, dtype)
    )(sample_idx)


class StyleGAN2Loss:
    """Bundles G/D module definitions + loss config into phase functions.

    ``vars_g`` / ``vars_d`` are flax variable dicts; gradients are taken
    w.r.t. their ``params`` leaves by the train step.
    """

    def __init__(
        self,
        G,
        D,
        cfg: StyleGAN2LossConfig = StyleGAN2LossConfig(),
        augment_fn: Optional[AugmentFn] = None,
    ):
        self.G = G
        self.D = D
        self.cfg = cfg
        self.augment_fn = augment_fn

    # ------------------------------------------------------------- helpers

    def _mapping(self, vars_g, z, c, update_emas: bool = False):
        """Returns (ws, mutated_emas_or_None)."""
        out = self.G.apply(
            vars_g, z, c, update_emas=update_emas,
            method=lambda m, z, c, **kw: m.mapping(z, c, **kw),
            mutable=["emas"] if update_emas else False,
        )
        if update_emas:
            ws, mutated = out
            return ws, mutated.get("emas", {})
        return out, None

    def _synthesis(self, vars_g, ws, rng, update_emas: bool = False,
                   sample_idx=None):
        """Returns (img, mutated_emas_or_None)."""
        kw = {}
        if sample_idx is not None and self.cfg.noise_mode == "random":
            # Mesh-size-invariant per-layer noise: each layer keys its noise
            # plane by global sample index (models/stylegan2.py).
            kw["sample_idx"] = sample_idx
        out = self.G.apply(
            vars_g, ws, noise_mode=self.cfg.noise_mode, update_emas=update_emas,
            method=lambda m, ws, **kw: m.synthesis(ws, **kw),
            rngs={"noise": rng},
            mutable=["emas"] if update_emas else False,
            **kw,
        )
        if update_emas:
            img, mutated = out
            return img, mutated.get("emas", {})
        return out, None

    def run_G(
        self, vars_g, z, c, rng, update_emas: bool = False, sample_idx=None
    ) -> Tuple[jax.Array, jax.Array, Optional[Dict]]:
        """mapping → style mixing → synthesis (reference ``loss.py:43-51``).

        With ``update_emas`` (the D-main fake pass, like the reference),
        returns the mutated ``emas`` collection (w_avg for SG2, plus
        per-layer magnitude_ema for SG3); the train step pmean-merges it
        into state so replicas stay consistent (the reference lets
        per-GPU buffers drift and broadcasts rank 0 at snapshots).
        """
        k_mix, k_cut, k_z2, k_noise = jax.random.split(rng, 4)
        ws, emas_map = self._mapping(vars_g, z, c, update_emas)
        if update_emas and emas_map:
            # Chain the updated collection into the synthesis pass so its
            # (full-collection) mutable return carries the new values too.
            vars_g = {**vars_g, "emas": emas_map}
        num_ws = ws.shape[1]
        if self.cfg.style_mixing_prob > 0:
            cutoff = jax.random.randint(k_cut, (), 1, num_ws)
            cutoff = jnp.where(
                jax.random.uniform(k_mix) < self.cfg.style_mixing_prob, cutoff, num_ws
            )
            if sample_idx is None:
                z2 = jax.random.normal(k_z2, z.shape, z.dtype)
            else:
                z2 = per_sample_normal(k_z2, sample_idx, z.shape[1:], z.dtype)
            ws2, _ = self._mapping(vars_g, z2, c)
            mask = (jnp.arange(num_ws)[None, :, None] >= cutoff)
            ws = jnp.where(mask, ws2, ws)
        img, emas_syn = self._synthesis(vars_g, ws, k_noise, update_emas,
                                        sample_idx=sample_idx)
        new_emas = None
        if update_emas:
            new_emas = emas_syn if emas_syn else (emas_map or vars_g["emas"])
            new_emas = jax.lax.stop_gradient(new_emas)
        return img, ws, new_emas

    def _blur(self, img, blur_sigma):
        """Shape-static discriminator blur ramp: worst-case taps, gaussian
        weights masked by the fading sigma (σ→0 degenerates to identity)."""
        blur_size = int(np.floor(self.cfg.blur_init_sigma * 3))
        t = jnp.arange(-blur_size, blur_size + 1, dtype=jnp.float32)
        sig = jnp.maximum(blur_sigma, 1e-8)
        f = jnp.exp2(-jnp.square(t / sig))
        f = jnp.where(jnp.abs(t) <= jnp.floor(blur_sigma * 3), f, 0.0)
        f = jnp.where(blur_sigma > 0, f / jnp.sum(f), (t == 0).astype(jnp.float32))
        return filter2d(img, f, flip_filter=False)

    def run_D(
        self, vars_d, img, c, rng, blur_sigma: Optional[jax.Array] = None, ada_p=None,
        sample_idx=None,
    ) -> jax.Array:
        """blur ramp → ADA augment → D (reference ``loss.py:53-62``)."""
        if self.cfg.blur_init_sigma > 0 and blur_sigma is not None:
            img = self._blur(img, blur_sigma)
        if self.augment_fn is not None:
            k_aug, rng = jax.random.split(rng)
            img = self._augment(img, ada_p, k_aug, sample_idx)
        return self.D.apply(vars_d, img, c)

    def _augment(self, img, ada_p, key, sample_idx):
        """Invoke the augment pipe, forwarding per-sample global keying when
        the pipe supports it (mesh-size invariance mode)."""
        if sample_idx is not None:
            return self.augment_fn(img, ada_p, key, sample_idx=sample_idx)
        return self.augment_fn(img, ada_p, key)

    def blur_sigma(self, cur_nimg) -> Optional[jax.Array]:
        if self.cfg.blur_fade_kimg <= 0:
            return None
        return (
            jnp.maximum(1.0 - cur_nimg / (self.cfg.blur_fade_kimg * 1e3), 0.0)
            * self.cfg.blur_init_sigma
        )

    # -------------------------------------------------------------- phases

    def gmain(
        self, params_g, extras_g, vars_d, z, c, rng, ada_p, cur_nimg,
        sample_idx=None,
    ) -> Tuple[jax.Array, stats.Moments]:
        """Non-saturating generator loss (reference ``loss.py:73-82``)."""
        vars_g = {"params": params_g, **extras_g}
        k_g, k_d = jax.random.split(rng)
        img, _ws, _wmean = self.run_G(vars_g, z, c, k_g, sample_idx=sample_idx)
        logits = self.run_D(vars_d, img, c, k_d, self.blur_sigma(cur_nimg), ada_p,
                            sample_idx=sample_idx)
        loss = jax.nn.softplus(-logits)
        m: stats.Moments = {}
        m = stats.report(m, "Loss/scores/fake", logits)
        m = stats.report(m, "Loss/signs/fake", jnp.sign(logits))
        m = stats.report(m, "Loss/G/loss", loss)
        return jnp.mean(loss), m

    def gpl(
        self, params_g, extras_g, z, c, rng, pl_mean, sample_idx=None,
        batch_mean_fn=jnp.mean,
    ) -> Tuple[jax.Array, Tuple[jax.Array, stats.Moments]]:
        """Path-length regularisation (reference ``loss.py:85-100``).

        Returns (loss, (new_pl_mean, moments)).  The caller multiplies by
        the lazy-reg gain.  ``batch_mean_fn`` reduces ``pl_lengths`` to the
        batch mean for the pl_mean lerp — the stepper passes a pmean'd
        global mean so the tracked statistic (and hence the penalty) is
        identical on every shard.  (The reference's per-rank ``pl_mean``
        buffers drift independently, ``loss.py:87``/``misc.py``; using the
        global batch mean removes that device-count dependence.)
        """
        vars_g = {"params": params_g, **extras_g}
        bsz = z.shape[0] // self.cfg.pl_batch_shrink
        z = z[:bsz]
        c = c[:bsz] if c is not None else None
        if sample_idx is not None:
            sample_idx = sample_idx[:bsz]
        k_g, k_noise, k_syn = jax.random.split(rng, 3)

        # ws via mapping + mixing (no EMA update in the PL pass).
        ws, _ = self._mapping(vars_g, z, c)
        num_ws = ws.shape[1]
        if self.cfg.style_mixing_prob > 0:
            k_mix, k_cut, k_z2 = jax.random.split(k_g, 3)
            cutoff = jax.random.randint(k_cut, (), 1, num_ws)
            cutoff = jnp.where(
                jax.random.uniform(k_mix) < self.cfg.style_mixing_prob, cutoff, num_ws
            )
            if sample_idx is None:
                z2 = jax.random.normal(k_z2, z.shape, z.dtype)
            else:
                z2 = per_sample_normal(k_z2, sample_idx, z.shape[1:], z.dtype)
            ws2, _ = self._mapping(vars_g, z2, c)
            ws = jnp.where(jnp.arange(num_ws)[None, :, None] >= cutoff, ws2, ws)

        def img_dot_noise(ws_in, key):
            img, _ = self._synthesis(vars_g, ws_in, key, sample_idx=sample_idx)
            if sample_idx is None:
                pl_noise = jax.random.normal(k_noise, img.shape)
            else:
                pl_noise = per_sample_normal(k_noise, sample_idx, img.shape[1:])
            pl_noise = pl_noise / np.sqrt(img.shape[1] * img.shape[2])
            return jnp.sum(img * pl_noise)

        pl_grads = jax.grad(_maybe_remat(img_dot_noise, _PL_REMAT))(ws, k_syn)
        # [N, num_ws, w_dim]
        pl_lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(pl_grads), axis=2), axis=1))
        # The lerped mean stays IN the graph for the penalty (reference
        # ``loss.py:93-95`` detaches only the buffer copy): the gradient
        # carries a -pl_decay/N cross-sample coupling term through
        # ``batch_mean_fn`` (a pmean'd global mean in the stepper, so the
        # coupling — like the penalty — is mesh-size invariant).
        new_pl_mean = pl_mean + self.cfg.pl_decay * (batch_mean_fn(pl_lengths) - pl_mean)
        pl_penalty = jnp.square(pl_lengths - new_pl_mean)
        loss = pl_penalty * self.cfg.pl_weight
        m: stats.Moments = {}
        m = stats.report(m, "Loss/pl_penalty", pl_penalty)
        m = stats.report(m, "Loss/G/reg", loss)
        return jnp.mean(loss), (jax.lax.stop_gradient(new_pl_mean), m)

    def dmain(
        self, params_d, vars_g, z, c, real_img, real_c, rng, ada_p, cur_nimg,
        sample_idx=None,
    ) -> Tuple[jax.Array, Tuple[Dict, stats.Moments]]:
        """Discriminator main loss (reference ``loss.py:103-127``).

        The fake pass runs G with ``update_emas=True`` (reference
        semantics): w_avg and (SG3) magnitude EMAs update here.
        Returns (loss, (new_emas_g, moments)).
        """
        k_g, k_d = jax.random.split(rng, 2)
        vars_d = {"params": params_d}
        bs = self.blur_sigma(cur_nimg)

        gen_img, _ws, new_emas = self.run_G(vars_g, z, c, k_g, update_emas=True,
                                            sample_idx=sample_idx)
        gen_img = jax.lax.stop_gradient(gen_img)

        # One blur+augment invocation over the concatenated fake∥real batch
        # (augmentations are per-sample independent, so this is equivalent
        # to the reference's two separate passes up to the RNG stream), then
        # split *before* D so minibatch-std groups stay fake-only/real-only
        # like the reference's separate D calls.
        both = jnp.concatenate([gen_img, real_img.astype(gen_img.dtype)], axis=0)
        if self.cfg.blur_init_sigma > 0 and bs is not None:
            both = self._blur(both, bs)
        if self.augment_fn is not None:
            k_aug, k_d = jax.random.split(k_d)
            # Invariance mode: key the fake half by 2g and the real half by
            # 2g+1 (g = global sample index) — unique per global row and
            # independent of the device count.
            idx_both = None
            if sample_idx is not None:
                idx_both = jnp.concatenate([2 * sample_idx, 2 * sample_idx + 1])
            both = self._augment(both, ada_p, k_aug, idx_both)
        n = gen_img.shape[0]
        gen_logits = self.D.apply(vars_d, both[:n], c)
        real_logits = self.D.apply(vars_d, both[n:], real_c)
        loss_dgen = jax.nn.softplus(gen_logits)
        loss_dreal = jax.nn.softplus(-real_logits)

        m: stats.Moments = {}
        m = stats.report(m, "Loss/scores/fake", gen_logits)
        m = stats.report(m, "Loss/signs/fake", jnp.sign(gen_logits))
        m = stats.report(m, "Loss/scores/real", real_logits)
        m = stats.report(m, "Loss/signs/real", jnp.sign(real_logits))
        m = stats.report(m, "Loss/D/loss", loss_dgen + loss_dreal)
        return jnp.mean(loss_dgen) + jnp.mean(loss_dreal), (new_emas, m)

    def dr1(
        self, params_d, real_img, real_c, rng, ada_p, cur_nimg, sample_idx=None
    ) -> Tuple[jax.Array, stats.Moments]:
        """R1 gradient penalty (reference ``loss.py:129-139``)."""
        vars_d = {"params": params_d}
        bs = self.blur_sigma(cur_nimg)

        def d_sum(img):
            logits = self.run_D(vars_d, img, real_c, rng, bs, ada_p,
                                sample_idx=sample_idx)
            return jnp.sum(logits), logits

        r1_grads, real_logits = jax.grad(
            _maybe_remat(d_sum, _R1_REMAT), has_aux=True)(real_img)
        r1_penalty = jnp.sum(jnp.square(r1_grads), axis=(1, 2, 3))
        loss = r1_penalty * (self.cfg.r1_gamma / 2)
        m: stats.Moments = {}
        m = stats.report(m, "Loss/scores/real", real_logits)
        m = stats.report(m, "Loss/signs/real", jnp.sign(real_logits))
        m = stats.report(m, "Loss/r1_penalty", r1_penalty)
        m = stats.report(m, "Loss/D/reg", loss)
        return jnp.mean(loss), m
