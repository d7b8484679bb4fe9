"""CycleGAN / pix2pix training engines.

Capability parity with the reference
``pytorch-CycleGAN-and-pix2pix/models/cycle_gan_model.py`` (two G + two
D, cycle-consistency L1 λ=10, identity loss λ_idt=0.5, LSGAN objective,
ImagePool replay buffer) and ``pix2pix_model.py`` (conditional GAN + L1
λ=100), with the linear/step/cosine LR schedulers of
``networks.py:38-64``.

TPU-native: each optimisation iteration is a single jitted step updating
all networks; the image pool lives on host (it is a python-random replay
buffer, reference ``util/image_pool.py``).
"""

from __future__ import annotations

import dataclasses
import random
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.image2image import define_D, define_G, gan_loss


class ImagePool:
    """History buffer of generated images (reference ``util/image_pool.py``)."""

    def __init__(self, pool_size: int = 50, seed: int = 0):
        self.pool_size = pool_size
        self.images = []
        self._rng = random.Random(seed)

    def query(self, images: np.ndarray) -> np.ndarray:
        if self.pool_size == 0:
            return images
        out = []
        for img in images:
            if len(self.images) < self.pool_size:
                self.images.append(img.copy())
                out.append(img)
            elif self._rng.random() > 0.5:
                idx = self._rng.randint(0, self.pool_size - 1)
                out.append(self.images[idx].copy())
                self.images[idx] = img.copy()
            else:
                out.append(img)
        return np.stack(out)


def make_lr_schedule(policy: str, lr: float, n_epochs: int, n_epochs_decay: int,
                     iters_per_epoch: int, step_size: int = 50):
    """reference ``get_scheduler`` (``networks.py:38-64``), as an optax
    schedule over iterations."""
    if policy == "linear":
        def sched(it):
            epoch = it // iters_per_epoch
            factor = 1.0 - jnp.maximum(0, epoch + 1 - n_epochs) / (n_epochs_decay + 1)
            return lr * jnp.clip(factor, 0.0, 1.0)
        return sched
    if policy == "step":
        def sched(it):
            epoch = it // iters_per_epoch
            return lr * 0.1 ** (epoch // step_size)
        return sched
    if policy == "cosine":
        total = n_epochs + n_epochs_decay
        def sched(it):
            epoch = it // iters_per_epoch
            return lr * 0.5 * (1 + jnp.cos(jnp.pi * epoch / total))
        return sched
    raise ValueError(policy)


@flax.struct.dataclass
class CycleGANState:
    step: jax.Array
    params_g_a: Any   # A -> B
    params_g_b: Any   # B -> A
    params_d_a: Any   # discriminates B
    params_d_b: Any   # discriminates A
    opt_g: optax.OptState
    opt_d_a: optax.OptState
    opt_d_b: optax.OptState


@dataclasses.dataclass
class CycleGANConfig:
    input_nc: int = 3
    output_nc: int = 3
    ngf: int = 64
    ndf: int = 64
    netG: str = "resnet_9blocks"
    netD: str = "basic"
    gan_mode: str = "lsgan"
    lambda_a: float = 10.0
    lambda_b: float = 10.0
    lambda_identity: float = 0.5
    lr: float = 2e-4
    beta1: float = 0.5
    pool_size: int = 50
    lr_policy: str = "linear"
    n_epochs: int = 100
    n_epochs_decay: int = 100


class CycleGANTrainer:
    """Two-direction CycleGAN (reference ``cycle_gan_model.py``)."""

    def __init__(self, cfg: CycleGANConfig, image_size: int = 256, iters_per_epoch: int = 1000):
        self.cfg = cfg
        self.g_a = define_G(cfg.output_nc, cfg.ngf, cfg.netG)
        self.g_b = define_G(cfg.input_nc, cfg.ngf, cfg.netG)
        self.d_a = define_D(cfg.ndf, cfg.netD)
        self.d_b = define_D(cfg.ndf, cfg.netD)
        sched = make_lr_schedule(cfg.lr_policy, cfg.lr, cfg.n_epochs, cfg.n_epochs_decay,
                                 iters_per_epoch)
        self.opt_g = optax.adam(sched, b1=cfg.beta1, b2=0.999)
        self.opt_d = optax.adam(sched, b1=cfg.beta1, b2=0.999)
        self.pool_a = ImagePool(cfg.pool_size)
        self.pool_b = ImagePool(cfg.pool_size)
        self._g_step = jax.jit(self._g_step_impl)
        self._d_step = jax.jit(self._d_step_impl)
        self._image_size = image_size

    def init_state(self, rng: jax.Array) -> CycleGANState:
        s = self._image_size
        ka, kb, kda, kdb = jax.random.split(rng, 4)
        dummy_a = jnp.zeros((1, s, s, self.cfg.input_nc))
        dummy_b = jnp.zeros((1, s, s, self.cfg.output_nc))
        pga = self.g_a.init(ka, dummy_a)["params"]
        pgb = self.g_b.init(kb, dummy_b)["params"]
        pda = self.d_a.init(kda, dummy_b)["params"]
        pdb = self.d_b.init(kdb, dummy_a)["params"]
        return CycleGANState(
            step=jnp.asarray(0),
            params_g_a=pga, params_g_b=pgb, params_d_a=pda, params_d_b=pdb,
            opt_g=self.opt_g.init({"a": pga, "b": pgb}),
            opt_d_a=self.opt_d.init(pda),
            opt_d_b=self.opt_d.init(pdb),
        )

    # --------------------------------------------------------------- G
    def _g_step_impl(self, state: CycleGANState, real_a, real_b):
        cfg = self.cfg

        def loss_fn(params):
            pga, pgb = params["a"], params["b"]
            fake_b = self.g_a.apply({"params": pga}, real_a)
            rec_a = self.g_b.apply({"params": pgb}, fake_b)
            fake_a = self.g_b.apply({"params": pgb}, real_b)
            rec_b = self.g_a.apply({"params": pga}, fake_a)

            loss = 0.0
            if cfg.lambda_identity > 0:
                idt_a = self.g_a.apply({"params": pga}, real_b)
                idt_b = self.g_b.apply({"params": pgb}, real_a)
                loss += jnp.mean(jnp.abs(idt_a - real_b)) * cfg.lambda_b * cfg.lambda_identity
                loss += jnp.mean(jnp.abs(idt_b - real_a)) * cfg.lambda_a * cfg.lambda_identity
            loss += gan_loss(self.d_a.apply({"params": state.params_d_a}, fake_b), True, cfg.gan_mode)
            loss += gan_loss(self.d_b.apply({"params": state.params_d_b}, fake_a), True, cfg.gan_mode)
            loss += jnp.mean(jnp.abs(rec_a - real_a)) * cfg.lambda_a
            loss += jnp.mean(jnp.abs(rec_b - real_b)) * cfg.lambda_b
            return loss, (fake_a, fake_b)

        params = {"a": state.params_g_a, "b": state.params_g_b}
        (loss, (fake_a, fake_b)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_g = self.opt_g.update(grads, state.opt_g, params)
        params = optax.apply_updates(params, updates)
        state = state.replace(params_g_a=params["a"], params_g_b=params["b"], opt_g=opt_g)
        return state, loss, fake_a, fake_b

    # --------------------------------------------------------------- D
    def _d_step_impl(self, state: CycleGANState, real_a, real_b, fake_a, fake_b):
        cfg = self.cfg

        def d_loss(params_d, d, real, fake):
            pred_real = d.apply({"params": params_d}, real)
            pred_fake = d.apply({"params": params_d}, jax.lax.stop_gradient(fake))
            return (gan_loss(pred_real, True, cfg.gan_mode)
                    + gan_loss(pred_fake, False, cfg.gan_mode)) * 0.5

        la, grads_a = jax.value_and_grad(d_loss)(state.params_d_a, self.d_a, real_b, fake_b)
        up_a, opt_d_a = self.opt_d.update(grads_a, state.opt_d_a, state.params_d_a)
        lb, grads_b = jax.value_and_grad(d_loss)(state.params_d_b, self.d_b, real_a, fake_a)
        up_b, opt_d_b = self.opt_d.update(grads_b, state.opt_d_b, state.params_d_b)
        return state.replace(
            params_d_a=optax.apply_updates(state.params_d_a, up_a),
            params_d_b=optax.apply_updates(state.params_d_b, up_b),
            opt_d_a=opt_d_a, opt_d_b=opt_d_b,
            step=state.step + 1,
        ), la, lb

    def optimize_parameters(self, state: CycleGANState, real_a, real_b
                            ) -> Tuple[CycleGANState, Dict[str, float]]:
        real_a = jnp.asarray(real_a)
        real_b = jnp.asarray(real_b)
        state, loss_g, fake_a, fake_b = self._g_step(state, real_a, real_b)
        fake_a = jnp.asarray(self.pool_a.query(np.asarray(fake_a)))
        fake_b = jnp.asarray(self.pool_b.query(np.asarray(fake_b)))
        state, loss_da, loss_db = self._d_step(state, real_a, real_b, fake_a, fake_b)
        return state, {"G": float(loss_g), "D_A": float(loss_da), "D_B": float(loss_db)}


@flax.struct.dataclass
class Pix2PixState:
    step: jax.Array
    params_g: Any
    params_d: Any
    opt_g: optax.OptState
    opt_d: optax.OptState


@dataclasses.dataclass
class Pix2PixConfig:
    input_nc: int = 3
    output_nc: int = 3
    ngf: int = 64
    ndf: int = 64
    netG: str = "unet_256"
    netD: str = "basic"
    gan_mode: str = "vanilla"
    lambda_l1: float = 100.0
    lr: float = 2e-4
    beta1: float = 0.5
    lr_policy: str = "linear"
    n_epochs: int = 100
    n_epochs_decay: int = 100
    no_dropout: bool = False   # reference --no_dropout (pix2pix defaults to
    #   dropout ON; turn off for deterministic curve comparisons)


class Pix2PixTrainer:
    """Conditional GAN + L1 (reference ``pix2pix_model.py``)."""

    def __init__(self, cfg: Pix2PixConfig, image_size: int = 256, iters_per_epoch: int = 1000):
        self.cfg = cfg
        self.use_dropout = not cfg.no_dropout
        self.g = define_G(cfg.output_nc, cfg.ngf, cfg.netG,
                          use_dropout=self.use_dropout)
        self.d = define_D(cfg.ndf, cfg.netD)
        sched = make_lr_schedule(cfg.lr_policy, cfg.lr, cfg.n_epochs, cfg.n_epochs_decay,
                                 iters_per_epoch)
        self.opt_g = optax.adam(sched, b1=cfg.beta1, b2=0.999)
        self.opt_d = optax.adam(sched, b1=cfg.beta1, b2=0.999)
        self._step = jax.jit(self._step_impl)
        self._image_size = image_size

    def init_state(self, rng: jax.Array) -> Pix2PixState:
        s = self._image_size
        kg, kd = jax.random.split(rng)
        dummy_a = jnp.zeros((1, s, s, self.cfg.input_nc))
        dummy_ab = jnp.zeros((1, s, s, self.cfg.input_nc + self.cfg.output_nc))
        pg = self.g.init(kg, dummy_a)["params"]
        pd = self.d.init(kd, dummy_ab)["params"]
        return Pix2PixState(
            step=jnp.asarray(0), params_g=pg, params_d=pd,
            opt_g=self.opt_g.init(pg), opt_d=self.opt_d.init(pd),
        )

    def _step_impl(self, state: Pix2PixState, real_a, real_b, rng):
        """One optimisation iteration, reference ``pix2pix_model.py``
        ``optimize_parameters`` ORDER: forward with the current G, update D
        against the detached fake, then update G against the *updated* D
        (the reference calls backward_G after optimizer_D.step())."""
        cfg = self.cfg

        def g_forward(pg):
            return self.g.apply({"params": pg}, real_a, deterministic=not self.use_dropout,
                                rngs={"dropout": rng})

        fake_b = g_forward(state.params_g)

        def d_loss(pd):
            fake_ab = jnp.concatenate([real_a, jax.lax.stop_gradient(fake_b)], axis=-1)
            real_ab = jnp.concatenate([real_a, real_b], axis=-1)
            return (gan_loss(self.d.apply({"params": pd}, fake_ab), False, cfg.gan_mode)
                    + gan_loss(self.d.apply({"params": pd}, real_ab), True, cfg.gan_mode)) * 0.5

        ld, grads_d = jax.value_and_grad(d_loss)(state.params_d)
        up_d, opt_d = self.opt_d.update(grads_d, state.opt_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, up_d)

        def g_loss(pg):
            fake = g_forward(pg)   # same dropout key as the D-phase forward
            pred = self.d.apply({"params": params_d},
                                jnp.concatenate([real_a, fake], axis=-1))
            loss = gan_loss(pred, True, cfg.gan_mode)
            loss += jnp.mean(jnp.abs(fake - real_b)) * cfg.lambda_l1
            return loss

        lg, grads = jax.value_and_grad(g_loss)(state.params_g)
        up_g, opt_g = self.opt_g.update(grads, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, up_g)

        return state.replace(
            step=state.step + 1, params_g=params_g, params_d=params_d,
            opt_g=opt_g, opt_d=opt_d,
        ), lg, ld

    def optimize_parameters(self, state: Pix2PixState, real_a, real_b, rng=None
                            ) -> Tuple[Pix2PixState, Dict[str, float]]:
        if rng is None:
            rng = jax.random.fold_in(jax.random.PRNGKey(0), int(state.step))
        state, lg, ld = self._step(state, jnp.asarray(real_a), jnp.asarray(real_b), rng)
        return state, {"G": float(lg), "D": float(ld)}


class ColorizationTrainer(Pix2PixTrainer):
    """pix2pix specialised to colorization: L channel -> ab channels in
    CIELAB (reference ``models/colorization_model.py``; the reference's
    only deltas over pix2pix are the 1->2 channel config — set by the
    colorization dataset mode — and Lab->RGB visuals)."""

    def __init__(self, cfg: Optional[Pix2PixConfig] = None, **kwargs):
        cfg = cfg or Pix2PixConfig()
        cfg = dataclasses.replace(cfg, input_nc=1, output_nc=2)
        super().__init__(cfg, **kwargs)

    @staticmethod
    def lab2rgb(L: np.ndarray, AB: np.ndarray) -> np.ndarray:
        """[-1,1] L plane + [-1,1] ab planes -> [0,255] RGB float array
        (reference ``colorization_model.py:48-63``: L2=(L+1)*50,
        AB2=AB*110, skimage lab2rgb, *255)."""
        from ..utils.colorspace import lab2rgb as _lab2rgb

        L = np.asarray(L, np.float64)
        AB = np.asarray(AB, np.float64)
        lab = np.concatenate([(L + 1.0) * 50.0, AB * 110.0], axis=-1)
        return _lab2rgb(lab) * 255.0

    def compute_visuals(self, real_a, real_b, fake_b) -> Dict[str, np.ndarray]:
        """reference ``compute_visuals``: input L, ground-truth RGB,
        predicted RGB (all NHWC numpy)."""
        return {
            "real_A": np.asarray(real_a),
            "real_B_rgb": self.lab2rgb(real_a, real_b),
            "fake_B_rgb": self.lab2rgb(real_a, fake_b),
        }


@flax.struct.dataclass
class RegressionState:
    step: jax.Array
    params_g: Any
    opt_g: optax.OptState


@dataclasses.dataclass
class RegressionConfig:
    input_nc: int = 3
    output_nc: int = 3
    ngf: int = 64
    netG: str = "unet_256"
    lambda_regression: float = 1.0
    lr: float = 2e-4
    beta1: float = 0.5
    lr_policy: str = "linear"
    n_epochs: int = 100
    n_epochs_decay: int = 100


class RegressionTrainer:
    """G-only L1 regression baseline ``min_G ||G(A) - B||_1`` (reference
    ``models/template_model.py`` — the 'template' model is a working
    regression i2i baseline, not just scaffolding)."""

    def __init__(self, cfg: RegressionConfig, image_size: int = 256,
                 iters_per_epoch: int = 1000):
        self.cfg = cfg
        self.g = define_G(cfg.output_nc, cfg.ngf, cfg.netG)
        sched = make_lr_schedule(cfg.lr_policy, cfg.lr, cfg.n_epochs,
                                 cfg.n_epochs_decay, iters_per_epoch)
        self.opt_g = optax.adam(sched, b1=cfg.beta1, b2=0.999)
        self._step = jax.jit(self._step_impl)
        self._image_size = image_size

    def init_state(self, rng: jax.Array) -> RegressionState:
        s = self._image_size
        dummy_a = jnp.zeros((1, s, s, self.cfg.input_nc))
        pg = self.g.init(rng, dummy_a)["params"]
        return RegressionState(step=jnp.asarray(0), params_g=pg,
                               opt_g=self.opt_g.init(pg))

    def _step_impl(self, state: RegressionState, real_a, real_b):
        def g_loss(pg):
            fake = self.g.apply({"params": pg}, real_a)
            return jnp.mean(jnp.abs(fake - real_b)) * self.cfg.lambda_regression

        lg, grads = jax.value_and_grad(g_loss)(state.params_g)
        up, opt_g = self.opt_g.update(grads, state.opt_g, state.params_g)
        return state.replace(
            step=state.step + 1,
            params_g=optax.apply_updates(state.params_g, up),
            opt_g=opt_g,
        ), lg

    def optimize_parameters(self, state: RegressionState, real_a, real_b, rng=None
                            ) -> Tuple[RegressionState, Dict[str, float]]:
        state, lg = self._step(state, jnp.asarray(real_a), jnp.asarray(real_b))
        return state, {"loss_G": float(lg)}
