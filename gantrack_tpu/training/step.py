"""The compiled training step: all phases of one global batch on the mesh.

Replaces the reference's per-GPU process loop + manual flat-grad
all-reduce (``training_loop_mi_multimodal.py:308-376``, SURVEY §2.9) with
a single ``shard_map``-over-``Mesh`` function per (Greg?, Dreg?) phase
combination:

* batch sharded on the ``data`` axis; params/state replicated;
* per-phase grads ``pmean``-reduced (the reference's all_reduce ÷ N),
  then NaN/Inf-scrubbed exactly like ``misc.nan_to_num(nan=0, ±1e5)``;
* per-device RNG via ``fold_in(key, step)`` then ``fold_in(key, device)``
  (reference: ``seed·num_gpus+rank``, ``training_loop:166-167``);
* mbstd groups and style-mixing cutoffs stay device-local, matching the
  reference's per-GPU behaviour;
* G-EMA lerp, pl_mean EMA, and the ADA sign-feedback controller
  (``training_loop:358-376``) are folded into the same compiled step —
  no host round-trips in the hot path.

Lazy regularisation runs Greg every ``g_reg_interval`` (4) and Dreg every
``d_reg_interval`` (16) batches with loss gain = interval; the host
selects among 4 statically-compiled variants by batch index.
"""

from __future__ import annotations

import dataclasses
import functools
import weakref
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import DATA_AXIS
from . import stats
from .loss import StyleGAN2Loss
from .train_state import GANTrainState


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    batch_size: int                   # global batch
    z_dim: int
    c_dim: int = 0
    ema_kimg: float = 10.0
    ema_rampup: Optional[float] = 0.05
    g_reg_interval: Optional[int] = 4
    d_reg_interval: Optional[int] = 16
    ada_target: Optional[float] = None      # None = ADA controller off
    ada_interval: int = 4
    ada_kimg: float = 500.0
    micro_batches: int = 1            # gradient accumulation (reference batch_gpu:
    #   local batch is processed in this many lax.scan chunks per phase;
    #   per-chunk mean-grads are SUMMED, matching the reference's
    #   accumulate-then-all_reduce semantics, training_loop:333-351)
    rng_mode: str = "device"          # "device": per-device RNG streams
    #   (production; reference seed*num_gpus+rank). "global_sample": phase
    #   keys identical on every device and all batch-shaped draws folded by
    #   GLOBAL sample index, so a 1-device and an N-device run of the same
    #   global batch produce bit-comparable updates — the numeric
    #   mesh-size-invariance check replacing the reference's
    #   check_ddp_consistency (torch_utils/misc.py:180-191).  Requires
    #   noise_mode="const", no augment, matching micro_batches, and
    #   pl_batch_shrink=1 (see tests/test_train_step.py).


def _scrub(grads):
    """nan→0, ±inf→±1e5, like reference ``misc.nan_to_num`` on reduced grads."""
    return jax.tree.map(
        lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5), grads
    )


def sample_gen_labels(key: jax.Array, label_bank: jax.Array, n: int) -> jax.Array:
    """Draw ``n`` generator-pass labels from the dataset's empirical label
    distribution: uniform row picks from the dataset label matrix, exactly
    the reference's ``get_label(np.random.randint(len(training_set)))``
    (``training_loop_mi_multimodal.py:319-321``)."""
    idx = jax.random.randint(key, (n,), 0, label_bank.shape[0])
    return label_bank[idx]


class TrainStepper:
    """Builds and dispatches the 4 compiled (Greg?, Dreg?) step variants.

    Single-device meshes use a plain-``jit`` fast path with identity
    collectives (mathematically equal to a 1-device ``shard_map``, and
    ~100× faster on the axon single-chip runtime, where shard_map's SPMD
    wrapping serialises execution).  Multi-device meshes use ``shard_map``
    with real psums.
    """

    def __init__(
        self,
        loss: StyleGAN2Loss,
        opt_g: optax.GradientTransformation,
        opt_d: optax.GradientTransformation,
        cfg: TrainStepConfig,
        mesh: Mesh,
        label_bank: Optional[Any] = None,   # [K, c_dim] dataset label matrix
    ):
        self.loss = loss
        self.opt_g = opt_g
        self.opt_d = opt_d
        self.cfg = cfg
        self.mesh = mesh
        # Empirical gen-label distribution (reference training_loop:319-321);
        # closed over by the compiled step as a replicated constant.
        self.label_bank = None if label_bank is None else jnp.asarray(label_bank)
        self._single = int(mesh.devices.size) == 1
        self._steps: Dict[Tuple[bool, bool], Callable] = {}

    # --------------------------------------------- collective indirection

    def _axis_index(self):
        if self._single:
            return jnp.asarray(0, jnp.int32)
        return jax.lax.axis_index(DATA_AXIS)

    def _pmean(self, tree):
        if self._single:
            return tree
        return jax.tree.map(lambda g: jax.lax.pmean(g, DATA_AXIS), tree)

    def _psum_moments(self, moments):
        if self._single:
            return moments
        return stats.psum_moments(moments, DATA_AXIS)

    # --------------------------------------- gradient accumulation helpers

    @staticmethod
    def _chunk(x, m):
        """[B, ...] -> [m, B//m, ...]"""
        return x.reshape(m, x.shape[0] // m, *x.shape[1:])

    @staticmethod
    def _sum_scanned_moments(ms):
        """Scan-stacked moment dicts {name: [M, 3]} -> summed {name: [3]}."""
        return {k: jnp.sum(v, axis=0) for k, v in ms.items()}

    def _accum(self, grad_fn, params, chunked_inputs, carry_init=None):
        """Sum per-chunk mean-grads over a lax.scan (reference semantics:
        ``accumulate_gradients`` per micro-batch, grads summed,
        ``training_loop:333-351``).

        ``grad_fn(params, carry, *chunk) -> (grads, new_carry, moments)``.
        Returns (grads, carry, moments-summed).
        """
        zero_grads = jax.tree.map(jnp.zeros_like, params)

        def body(acc, chunk):
            grads_acc, carry = acc
            grads, carry, m = grad_fn(params, carry, *chunk)
            return (jax.tree.map(jnp.add, grads_acc, grads), carry), m

        (grads, carry), ms = jax.lax.scan(body, (zero_grads, carry_init), chunked_inputs)
        return grads, carry, self._sum_scanned_moments(ms)

    # ------------------------------------------------------------------

    def _device_step(self, do_gpl: bool, do_dr1: bool, state: GANTrainState,
                     real_img, real_c):
        cfg = self.cfg
        loss = self.loss
        local_b = real_img.shape[0]

        rng_step = jax.random.fold_in(state.rng, state.step)
        if cfg.rng_mode == "global_sample":
            # Same phase keys everywhere; per-sample draws keyed by global
            # sample index (mesh-size invariant — see TrainStepConfig).
            rng_dev = rng_step
            sample_idx = self._axis_index() * local_b + jnp.arange(local_b)
        else:
            rng_dev = jax.random.fold_in(rng_step, self._axis_index())
            sample_idx = None
        k = jax.random.split(rng_dev, 8)

        extras_g = {"emas": state.emas_g, **state.consts_g}
        params_g, params_d = state.params_g, state.params_d
        opt_g_state, opt_d_state = state.opt_g, state.opt_d
        moments: stats.Moments = {}
        cur_nimg = state.cur_nimg.astype(jnp.float32)

        def sample_zc(key):
            if sample_idx is not None:
                from .loss import per_sample_normal
                z = per_sample_normal(key, sample_idx, (cfg.z_dim,))
            else:
                z = jax.random.normal(key, (local_b, cfg.z_dim), jnp.float32)
            if cfg.c_dim > 0:
                kc = jax.random.fold_in(key, 1)
                if self.label_bank is not None:
                    # Dataset empirical label distribution (reference
                    # training_loop:319-321) — skewed datasets train
                    # identically to the reference.
                    if sample_idx is not None:
                        ids = jax.vmap(lambda i: jax.random.randint(
                            jax.random.fold_in(kc, i), (), 0,
                            self.label_bank.shape[0]))(sample_idx)
                        c = self.label_bank[ids]
                    else:
                        c = sample_gen_labels(kc, self.label_bank, local_b)
                else:
                    # No bank supplied: uniform one-hot fallback.
                    if sample_idx is not None:
                        idx = jax.vmap(lambda i: jax.random.randint(
                            jax.random.fold_in(kc, i), (), 0, cfg.c_dim))(sample_idx)
                    else:
                        idx = jax.random.randint(kc, (local_b,), 0, cfg.c_dim)
                    c = jax.nn.one_hot(idx, cfg.c_dim)
            else:
                c = None
            return z, c

        # ---------------------------------------------------- Gmain phase
        M = cfg.micro_batches
        z, gen_c = sample_zc(k[0])
        if M == 1:
            (loss_g, m_g), grads = jax.value_and_grad(loss.gmain, has_aux=True)(
                params_g, extras_g, {"params": params_d}, z, gen_c, k[1],
                state.ada_p, cur_nimg, sample_idx,
            )
        else:
            def gmain_chunk(p, carry, zc, cc, key):
                c_arg = cc if cfg.c_dim > 0 else None
                (_, m), g = jax.value_and_grad(loss.gmain, has_aux=True)(
                    p, extras_g, {"params": params_d}, zc, c_arg, key,
                    state.ada_p, cur_nimg,
                )
                return g, carry, m

            cc = self._chunk(gen_c if gen_c is not None else jnp.zeros((local_b, 0)), M)
            grads, _, m_g = self._accum(
                gmain_chunk, params_g,
                (self._chunk(z, M), cc, jax.random.split(k[1], M)),
            )
        grads = _scrub(self._pmean(grads))
        updates, opt_g_state = self.opt_g.update(grads, opt_g_state, params_g)
        params_g = optax.apply_updates(params_g, updates)
        moments = stats.merge(moments, m_g)

        # ------------------------------------------------------ Greg (PL)
        pl_mean = state.pl_mean
        if do_gpl:
            gain = float(cfg.g_reg_interval)
            z, gen_c = sample_zc(k[2])
            if M == 1:
                def gpl_scaled(p):
                    # pl_mean lerps toward the GLOBAL batch mean (pmean'd),
                    # so the tracked stat — and the penalty derived from it
                    # — is shard-identical (mesh-size invariant; the
                    # reference's per-rank buffers drift instead).
                    l, aux = loss.gpl(
                        p, extras_g, z, gen_c, k[3], pl_mean, sample_idx,
                        batch_mean_fn=lambda x: self._pmean(jnp.mean(x)))
                    return l * gain, aux

                (_, (new_pl_mean, m_pl)), grads = jax.value_and_grad(
                    gpl_scaled, has_aux=True
                )(params_g)
            else:
                def gpl_chunk(p, pl_carry, zc, cc, key):
                    c_arg = cc if cfg.c_dim > 0 else None

                    def scaled(pp):
                        l, aux = loss.gpl(
                            pp, extras_g, zc, c_arg, key, pl_carry,
                            batch_mean_fn=lambda x: self._pmean(jnp.mean(x)))
                        return l * gain, aux

                    (_, (new_pl, m)), g = jax.value_and_grad(scaled, has_aux=True)(p)
                    return g, new_pl, m

                cc = self._chunk(gen_c if gen_c is not None else jnp.zeros((local_b, 0)), M)
                grads, new_pl_mean, m_pl = self._accum(
                    gpl_chunk, params_g,
                    (self._chunk(z, M), cc, jax.random.split(k[3], M)),
                    carry_init=pl_mean,
                )
            grads = _scrub(self._pmean(grads))
            updates, opt_g_state = self.opt_g.update(grads, opt_g_state, params_g)
            params_g = optax.apply_updates(params_g, updates)
            pl_mean = self._pmean(new_pl_mean)
            moments = stats.merge(moments, m_pl)

        # ---------------------------------------------------- Dmain phase
        z, gen_c = sample_zc(k[4])
        if M == 1:
            vars_g = {"params": params_g, **state.consts_g, "emas": state.emas_g}
            (loss_d, (new_emas, m_d)), grads = jax.value_and_grad(
                loss.dmain, has_aux=True
            )(params_d, vars_g, z, gen_c, real_img, real_c, k[5], state.ada_p,
              cur_nimg, sample_idx)
        else:
            def dmain_chunk(p, emas_carry, zc, cc, ri, rc, key):
                c_arg = cc if cfg.c_dim > 0 else None
                vg = {"params": params_g, **state.consts_g, "emas": emas_carry}
                (_, (new_e, m)), g = jax.value_and_grad(loss.dmain, has_aux=True)(
                    p, vg, zc, c_arg, ri, rc, key, state.ada_p, cur_nimg
                )
                return g, new_e, m

            cc = self._chunk(gen_c if gen_c is not None else jnp.zeros((local_b, 0)), M)
            grads, new_emas, m_d = self._accum(
                dmain_chunk, params_d,
                (self._chunk(z, M), cc, self._chunk(real_img, M),
                 self._chunk(real_c, M), jax.random.split(k[5], M)),
                carry_init=state.emas_g,
            )
        grads = _scrub(self._pmean(grads))
        updates, opt_d_state = self.opt_d.update(grads, opt_d_state, params_d)
        params_d = optax.apply_updates(params_d, updates)
        moments = stats.merge(moments, m_d)

        # EMA buffers (w_avg; SG3 magnitude_ema) from the Dmain fake pass
        # (reference semantics), pmean'd so replicas stay consistent
        # (improvement over per-replica drift in the reference).
        emas_g = self._pmean(new_emas) if new_emas is not None else state.emas_g

        # ------------------------------------------------------ Dreg (R1)
        if do_dr1:
            gain = float(cfg.d_reg_interval)

            if M == 1:
                def dr1_scaled(p):
                    l, m = loss.dr1(p, real_img, real_c, k[6], state.ada_p,
                                    cur_nimg, sample_idx)
                    return l * gain, m

                (_, m_r1), grads = jax.value_and_grad(dr1_scaled, has_aux=True)(params_d)
            else:
                def dr1_chunk(p, carry, ri, rc, key):
                    def scaled(pp):
                        l, m = loss.dr1(pp, ri, rc, key, state.ada_p, cur_nimg)
                        return l * gain, m

                    (_, m), g = jax.value_and_grad(scaled, has_aux=True)(p)
                    return g, carry, m

                grads, _, m_r1 = self._accum(
                    dr1_chunk, params_d,
                    (self._chunk(real_img, M), self._chunk(real_c, M),
                     jax.random.split(k[6], M)),
                )
            grads = _scrub(self._pmean(grads))
            updates, opt_d_state = self.opt_d.update(grads, opt_d_state, params_d)
            params_d = optax.apply_updates(params_d, updates)
            moments = stats.merge(moments, m_r1)

        # --------------------------------------------------------- G-EMA
        ema_nimg = cfg.ema_kimg * 1000.0
        if cfg.ema_rampup is not None:
            ema_nimg = jnp.minimum(ema_nimg, cur_nimg * cfg.ema_rampup)
        ema_beta = jnp.power(0.5, cfg.batch_size / jnp.maximum(ema_nimg, 1e-8))
        params_g_ema = jax.tree.map(
            lambda p, e: p + (e - p) * ema_beta, params_g, state.params_g_ema
        )

        # ------------------------------------------------ ADA controller
        moments = self._psum_moments(moments)
        ada_p = state.ada_p
        ada_signs = state.ada_signs
        if cfg.ada_target is not None:
            sr = moments.get("Loss/signs/real")
            ada_signs = ada_signs + jnp.stack([sr[0], sr[1]])
            do_update = (state.step + 1) % cfg.ada_interval == 0
            mean_sign = ada_signs[1] / jnp.maximum(ada_signs[0], 1.0)
            adjust = (
                jnp.sign(mean_sign - cfg.ada_target)
                * (cfg.batch_size * cfg.ada_interval)
                / (cfg.ada_kimg * 1000.0)
            )
            ada_p = jnp.where(do_update, jnp.maximum(ada_p + adjust, 0.0), ada_p)
            ada_signs = jnp.where(do_update, jnp.zeros_like(ada_signs), ada_signs)
        moments = stats.report(moments, "Progress/augment", ada_p)

        new_state = state.replace(
            step=state.step + 1,
            cur_nimg=state.cur_nimg + cfg.batch_size,
            params_g=params_g,
            params_d=params_d,
            params_g_ema=params_g_ema,
            emas_g=emas_g,
            opt_g=opt_g_state,
            opt_d=opt_d_state,
            pl_mean=pl_mean,
            ada_p=ada_p,
            ada_signs=ada_signs,
        )
        return new_state, moments

    # ------------------------------------------------------------------

    def _build(self, do_gpl: bool, do_dr1: bool):
        fn = functools.partial(self._device_step, do_gpl, do_dr1)
        if self._single:
            return jax.jit(fn, donate_argnums=(0,))
        mapped = jax.shard_map(
            fn,
            mesh=self.mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(mapped, donate_argnums=(0,))

    def get(self, do_gpl: bool, do_dr1: bool):
        key = (bool(do_gpl), bool(do_dr1))
        if key not in self._steps:
            self._steps[key] = self._build(*key)
        return self._steps[key]

    def __call__(self, state: GANTrainState, real_img, real_c=None):
        """Run one global batch; phase selection by batch index (host-side,
        reference ``training_loop:333-334``).

        The batch index is mirrored on host after the first call so the
        hot loop never blocks on the device counter.
        """
        prev = getattr(self, "_last_state_ref", None)
        if (
            getattr(self, "_host_step", None) is None
            or prev is None
            or prev() is not state
        ):
            # One device sync at start/resume — and whenever the caller swaps
            # in a state this stepper didn't produce (restored checkpoint,
            # another stepper's output, eval/train interleaving), so phase
            # scheduling can't silently desynchronise from state.step.  The
            # identity check holds a *weakref* to the state we returned last:
            # exact while that object is alive (unlike raw id(), which CPython
            # recycles), and a dead referent returns None, forcing a resync.
            self._host_step = int(state.step)
        step = self._host_step
        self._host_step += 1
        do_gpl, do_dr1 = self._phase_flags(step)
        if real_c is None:
            real_c = jnp.zeros((real_img.shape[0], 0), jnp.float32)
        out = self.get(do_gpl, do_dr1)(state, real_img, real_c)
        self._last_state_ref = weakref.ref(out[0])
        return out

    def _phase_flags(self, step: int) -> Tuple[bool, bool]:
        """Lazy-regularisation cadence for host batch index ``step``
        (reference ``training_loop_mi_multimodal.py:333-337``)."""
        do_gpl = (
            self.cfg.g_reg_interval is not None
            and self.loss.cfg.pl_weight != 0
            and step % self.cfg.g_reg_interval == 0
        )
        do_dr1 = (
            self.cfg.d_reg_interval is not None
            and self.loss.cfg.r1_gamma != 0
            and step % self.cfg.d_reg_interval == 0
        )
        return do_gpl, do_dr1
