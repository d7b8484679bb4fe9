"""StyleGAN2 TRAINING-dynamics validation vs the reference loop.

Transplant forward parity (test_stylegan2_networks.py) proves the
networks; these tests prove the flagship *training path* — the strongest
weights-free evidence that trained-model quality will match:

* gradient tier: with transplanted init and identical inputs, the FULL
  parameter gradient of every phase (Gmain, Greg incl. the PL
  double-backward, Dmain, Dreg incl. the R1 double-backward) matches the
  torch autograd gradients of the REFERENCE StyleGAN2Loss
  (``training/loss.py:23-139``) tensor-by-tensor at fp32 noise level.
  This is the chaos-free semantic pin — it caught a real bug (our PL
  penalty detached the lerped pl_mean; the reference keeps it in the
  graph, ``loss.py:93-95``, adding a -pl_decay/N cross-sample coupling).
* deterministic tier: identical per-phase latents and path-length noise
  (replayed from the TrainStepper's own key derivation), const synthesis
  noise, style mixing off, N steps of our compiled TrainStepper and of a
  torch loop built from the reference loss + the reference training
  loop's update semantics (``training_loop_mi_multimodal.py:308-376``:
  per-phase lazy-reg Adam with mb_ratio scaling, grad nan_to_num, G_ema
  lerp with rampup): per-step loss curves match while the trajectories
  are fp-coherent, window means and the pl_mean EMA match throughout.
  (Exact final-param equality is impossible in fp32: with beta1=0 the
  first Adam update is exactly ±lr, so params whose gradient is at fp
  noise level take opposite-sign steps and the divergence compounds
  exponentially — measured max-param drift reaches O(1) relative by step
  ~8 on BOTH a bugged and a correct implementation, which is why the
  gradient tier above, not param equality, is the semantic check.)
* statistical tier: the full production recipe (ADA augment pipe +
  controller, style mixing, random synthesis noise) with each side using
  its own RNG for a few hundred steps: D(real)/D(fake) score
  trajectories, r1/pl penalty magnitudes, and the ADA-p trajectory must
  agree at the distribution level.
"""

import copy
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import has_reference, import_reference_module

torch = pytest.importorskip("torch")

from gantrack_tpu.models.stylegan2 import Discriminator, Generator
from gantrack_tpu.models.torch_compat import (
    discriminator_params_from_torch,
    generator_params_from_torch,
    transplant_into_state,
)
from gantrack_tpu.parallel.mesh import create_mesh, shard_batch
from gantrack_tpu.training import (
    StyleGAN2Loss,
    StyleGAN2LossConfig,
    TrainStepConfig,
    TrainStepper,
    create_train_state,
    lazy_reg_adam,
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not has_reference(), reason="reference tree not present"),
]

ZDIM = 16
LR = 0.0025
BETAS = (0.0, 0.99)
G_INT, D_INT = 4, 16


class _SimpleNamespaceG:
    """Minimal G facade for the reference loss: mapping + synthesis with
    noise_mode pinned to 'const' (the reference loss hardcodes the default
    'random'; determinism needs const on both sides)."""

    def __init__(self, g_torch):
        self._g = g_torch
        self.mapping = g_torch.mapping
        self.z_dim = g_torch.z_dim

    def synthesis(self, ws, update_emas=False, **kw):
        return self._g.synthesis(ws, update_emas=update_emas,
                                 noise_mode="const", **kw)


def _build_pair(res, cbase, cmax, mbstd_group):
    nets = import_reference_module("training.networks_stylegan2")
    torch.manual_seed(0)
    g_ref = nets.Generator(
        z_dim=ZDIM, c_dim=0, w_dim=ZDIM, img_resolution=res, img_channels=1,
        mapping_kwargs={"num_layers": 2},
        channel_base=cbase, channel_max=cmax, num_fp16_res=0,
    ).train().requires_grad_(False)
    d_ref = nets.Discriminator(
        c_dim=0, img_resolution=res, img_channels=1,
        channel_base=cbase, channel_max=cmax, num_fp16_res=0,
        epilogue_kwargs={"mbstd_group_size": mbstd_group},
    ).train().requires_grad_(False)
    g_ema_ref = copy.deepcopy(g_ref).eval()

    g = Generator(
        z_dim=ZDIM, c_dim=0, w_dim=ZDIM, img_resolution=res, img_channels=1,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=cbase, channel_max=cmax,
                              num_fp16_res=0),
    )
    d = Discriminator(
        c_dim=0, img_resolution=res, img_channels=1,
        channel_base=cbase, channel_max=cmax, num_fp16_res=0,
        epilogue_kwargs=dict(mbstd_group_size=mbstd_group),
    )
    return g_ref, d_ref, g_ema_ref, g, d


def _ref_optimizers(g_ref, d_ref):
    """Reference lazy-reg Adam (``training_loop_mi_multimodal.py:248-255``)."""
    opts = []
    for module, interval in ((g_ref, G_INT), (d_ref, D_INT)):
        mb = interval / (interval + 1)
        opts.append(torch.optim.Adam(
            module.parameters(), lr=LR * mb,
            betas=tuple(b ** mb for b in BETAS), eps=1e-8))
    return opts


def _ref_phase_step(loss_ref, module, opt, phase, real_img, real_c, gen_z,
                    gen_c, gain, cur_nimg):
    """One phase of the reference loop: zero grads, accumulate, nan_to_num
    the flattened grads, step (``training_loop_mi_multimodal.py:326-351``)."""
    opt.zero_grad(set_to_none=True)
    module.requires_grad_(True)
    loss_ref.accumulate_gradients(phase=phase, real_img=real_img,
                                  real_c=real_c, gen_z=gen_z, gen_c=gen_c,
                                  gain=gain, cur_nimg=cur_nimg)
    module.requires_grad_(False)
    params = [p for p in module.parameters() if p.grad is not None]
    if params:
        flat = torch.cat([p.grad.flatten() for p in params])
        torch.nan_to_num(flat, nan=0, posinf=1e5, neginf=-1e5, out=flat)
        grads = flat.split([p.numel() for p in params])
        for p, gr in zip(params, grads):
            p.grad = gr.reshape(p.shape)
    opt.step()


def _t(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def _stepper_draws(state_rng, step, batch, zdim, img_shape, pl_shrink):
    """Replay the TrainStepper's exact per-step RNG derivation
    (training/step.py: fold_in(rng, step) → fold_in(·, device=0) →
    split 8) so the torch mirror consumes the same latents and PL noise."""
    rd = jax.random.fold_in(jax.random.fold_in(state_rng, step), 0)
    k = jax.random.split(rd, 8)
    z_g = np.asarray(jax.random.normal(k[0], (batch, zdim), jnp.float32))
    z_pl = np.asarray(jax.random.normal(k[2], (batch, zdim), jnp.float32))
    k3 = jax.random.split(k[3], 3)
    n, h, w, c = img_shape
    pl_noise = np.asarray(jax.random.normal(
        k3[1], (batch // pl_shrink, h, w, c), jnp.float32))
    z_d = np.asarray(jax.random.normal(k[4], (batch, zdim), jnp.float32))
    return z_g, z_pl, pl_noise, z_d


def _torch_phase_grads(loss_ref, module, phase, real, gen_z, batch):
    """Harvest one phase's parameter gradients from the reference loss as a
    weights-are-grads clone (the torch→flax converters are pure layout
    transposes, so they map gradients exactly like parameters)."""
    real_c = torch.zeros(batch, 0)
    for p in module.parameters():
        p.grad = None
    module.requires_grad_(True)
    loss_ref.accumulate_gradients(
        phase=phase, real_img=real, real_c=real_c,
        gen_z=torch.from_numpy(gen_z), gen_c=real_c, gain=1.0, cur_nimg=0)
    module.requires_grad_(False)
    clone = copy.deepcopy(module)
    for pc, p in zip(clone.parameters(), module.parameters()):
        pc.data = (p.grad if p.grad is not None else torch.zeros_like(p)).clone()
    return clone


def test_sg2_phase_gradients_match_reference():
    """Full parameter gradients of all four phases at transplanted init vs
    torch autograd through the reference StyleGAN2Loss: every tensor within
    1e-4 relative norm (fp32 noise; double-backwards included)."""
    res, cbase, cmax, batch = 32, 256, 64, 8
    g_ref, d_ref, g_ema_ref, g, d = _build_pair(res, cbase, cmax, mbstd_group=4)
    loss_mod = import_reference_module("training.loss")

    pl_shrink = 2
    loss_ref = loss_mod.StyleGAN2Loss(
        device=torch.device("cpu"), G=_SimpleNamespaceG(g_ref), D=d_ref,
        augment_pipe=None, r1_gamma=1.0, style_mixing_prob=0.0,
        pl_weight=2.0, pl_batch_shrink=pl_shrink)

    opt_g = lazy_reg_adam(LR, betas=BETAS, reg_interval=G_INT)
    opt_d = lazy_reg_adam(LR, betas=BETAS, reg_interval=D_INT)
    state = create_train_state(
        g, d, jax.random.PRNGKey(0), opt_g, opt_d,
        z_dim=ZDIM, c_dim=0, img_resolution=res, img_channels=1)
    state = transplant_into_state(state, g_ref, d_ref, g_ema_ref)
    loss = StyleGAN2Loss(g, d, StyleGAN2LossConfig(
        r1_gamma=1.0, style_mixing_prob=0.0, pl_weight=2.0,
        pl_batch_shrink=pl_shrink, noise_mode="const"))

    real_np = np.random.default_rng(3).uniform(
        -1, 1, (batch, res, res, 1)).astype(np.float32)
    z_g, z_pl, pl_noise, z_d = _stepper_draws(
        state.rng, 0, batch, ZDIM, (batch, res, res, 1), pl_shrink)
    k = jax.random.split(
        jax.random.fold_in(jax.random.fold_in(state.rng, 0), 0), 8)

    zc = jnp.zeros((batch, 0))
    real = jnp.asarray(real_np)
    extras_g = {"emas": state.emas_g, **state.consts_g}
    vars_g = {"params": state.params_g, **extras_g}
    vars_d = {"params": state.params_d}

    ours = {
        "Gmain": jax.grad(lambda p: loss.gmain(
            p, extras_g, vars_d, jnp.asarray(z_g), zc, k[0],
            jnp.asarray(0.0), 0)[0])(state.params_g),
        "Greg": jax.grad(lambda p: loss.gpl(
            p, extras_g, jnp.asarray(z_pl), zc, k[3],
            state.pl_mean)[0])(state.params_g),
        "Dmain": jax.grad(lambda p: loss.dmain(
            p, vars_g, jnp.asarray(z_d), zc, real, zc, k[4],
            jnp.asarray(0.0), 0)[0])(state.params_d),
        "Dreg": jax.grad(lambda p: loss.dr1(
            p, real, zc, k[5], jnp.asarray(0.0), 0)[0])(state.params_d),
    }

    real_t = _t(real_np)
    refs = {}
    refs["Gmain"] = generator_params_from_torch(_SimpleNamespaceG(
        _torch_phase_grads(loss_ref, g_ref, "Gmain", real_t, z_g, batch))._g,
    )["params"]
    # Greg consumes torch.randn_like once (loss.py:96, pre-division by
    # sqrt(HW)); inject our stepper's PL noise draw there.
    injected = _t(pl_noise)
    orig_randn_like = torch.randn_like
    torch.randn_like = lambda x: injected
    try:
        refs["Greg"] = generator_params_from_torch(
            _torch_phase_grads(loss_ref, g_ref, "Greg", real_t, z_pl, batch),
        )["params"]
    finally:
        torch.randn_like = orig_randn_like
    refs["Dmain"] = discriminator_params_from_torch(
        _torch_phase_grads(loss_ref, d_ref, "Dmain", real_t, z_d, batch))["params"]
    refs["Dreg"] = discriminator_params_from_torch(
        _torch_phase_grads(loss_ref, d_ref, "Dreg", real_t, z_d, batch))["params"]

    for phase in ("Gmain", "Greg", "Dmain", "Dreg"):
        flat_o = jax.tree_util.tree_flatten_with_path(ours[phase])[0]
        flat_r = jax.tree_util.tree_flatten_with_path(refs[phase])[0]
        assert len(flat_o) == len(flat_r)
        for (po, a), (_, b) in zip(flat_o, flat_r):
            a = np.asarray(a, np.float64).ravel()
            b = np.asarray(b, np.float64).ravel()
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            name = f"{phase}{jax.tree_util.keystr(po)}"
            if nb < 1e-12:
                assert na < 1e-10, name
                continue
            relnorm = float(np.linalg.norm(a - b) / nb)
            assert relnorm < 1e-4, f"{name}: relnorm={relnorm:.3e}"


def test_sg2_training_curve_matches_reference():
    """18 steps of the full lazy-reg recipe (Gmain every step, Greg every 4
    with injected PL noise, Dmain every step, Dreg at 0 and 16; Adam with
    mb_ratio scaling; G-EMA rampup; pl_mean EMA): per-step loss curves and
    final G/D/G-EMA parameters match the reference loop semantics."""
    res, cbase, cmax, batch, steps = 32, 256, 64, 8, 18
    g_ref, d_ref, g_ema_ref, g, d = _build_pair(res, cbase, cmax, mbstd_group=4)
    loss_mod = import_reference_module("training.loss")
    stats_mod = import_reference_module("torch_utils.training_stats")

    pl_shrink = 2
    loss_ref = loss_mod.StyleGAN2Loss(
        device=torch.device("cpu"), G=_SimpleNamespaceG(g_ref), D=d_ref,
        augment_pipe=None, r1_gamma=1.0, style_mixing_prob=0.0,
        pl_weight=2.0, pl_batch_shrink=pl_shrink)
    opt_g_ref, opt_d_ref = _ref_optimizers(g_ref, d_ref)

    # ---- ours: the real compiled TrainStepper on a 1-device mesh
    opt_g = lazy_reg_adam(LR, betas=BETAS, reg_interval=G_INT)
    opt_d = lazy_reg_adam(LR, betas=BETAS, reg_interval=D_INT)
    state = create_train_state(
        g, d, jax.random.PRNGKey(0), opt_g, opt_d,
        z_dim=ZDIM, c_dim=0, img_resolution=res, img_channels=1)
    state = transplant_into_state(state, g_ref, d_ref, g_ema_ref)
    loss = StyleGAN2Loss(g, d, StyleGAN2LossConfig(
        r1_gamma=1.0, style_mixing_prob=0.0, pl_weight=2.0,
        pl_batch_shrink=pl_shrink, noise_mode="const"))
    cfg = TrainStepConfig(batch_size=batch, z_dim=ZDIM, c_dim=0,
                          ema_kimg=10.0, ema_rampup=0.05,
                          g_reg_interval=G_INT, d_reg_interval=D_INT,
                          ada_target=None)
    mesh = create_mesh(1)
    stepper = TrainStepper(loss, opt_g, opt_d, cfg, mesh)

    rng = np.random.default_rng(3)
    reals = [rng.uniform(-1, 1, (batch, res, res, 1)).astype(np.float32)
             for _ in range(steps)]
    # Replay the stepper's draws BEFORE stepping: the compiled step donates
    # the state buffers, so state.rng is unreadable afterwards.
    draws = [_stepper_draws(state.rng, i, batch, ZDIM,
                            (batch, res, res, 1), pl_shrink)
             for i in range(steps)]

    ours_curve = []
    for i in range(steps):
        state, moments = stepper(state, shard_batch(mesh, jnp.asarray(reals[i])))
        m = {k: float(v[1] / v[0]) for k, v in moments.items()}
        ours_curve.append(m)
    assert int(state.step) == steps

    # ---- the torch mirror of the reference loop
    collector = stats_mod.Collector(regex="Loss/.*")
    ref_curve = []
    cur_nimg = 0
    orig_randn_like = torch.randn_like
    for i in range(steps):
        z_g, z_pl, pl_noise, z_d = draws[i]
        real = _t(reals[i])
        real_c = torch.zeros(batch, 0)
        zc = torch.zeros(batch, 0)
        _ref_phase_step(loss_ref, g_ref, opt_g_ref, "Gmain", real, real_c,
                        torch.from_numpy(z_g), zc, 1.0, cur_nimg)
        if i % G_INT == 0:
            # Inject OUR stepper's PL noise draw (the single RNG consumer
            # of the Greg phase) — torch.randn_like is the reference's
            # only call site in Gpl (loss.py:96; it divides by sqrt(HW)
            # itself).
            injected = _t(pl_noise)
            torch.randn_like = lambda x: injected
            try:
                _ref_phase_step(loss_ref, g_ref, opt_g_ref, "Greg", real,
                                real_c, torch.from_numpy(z_pl), zc,
                                float(G_INT), cur_nimg)
            finally:
                torch.randn_like = orig_randn_like
        _ref_phase_step(loss_ref, d_ref, opt_d_ref, "Dmain", real, real_c,
                        torch.from_numpy(z_d), zc, 1.0, cur_nimg)
        if i % D_INT == 0:
            _ref_phase_step(loss_ref, d_ref, opt_d_ref, "Dreg", real, real_c,
                            torch.from_numpy(z_d), zc, float(D_INT), cur_nimg)
        # G_ema lerp + rampup (training_loop:357-366).
        ema_nimg = min(10.0 * 1000, cur_nimg * 0.05)
        ema_beta = 0.5 ** (batch / max(ema_nimg, 1e-8))
        with torch.no_grad():
            for p_ema, p in zip(g_ema_ref.parameters(), g_ref.parameters()):
                p_ema.copy_(p.lerp(p_ema, ema_beta))
            for b_ema, b in zip(g_ema_ref.buffers(), g_ref.buffers()):
                b_ema.copy_(b)
        cur_nimg += batch
        collector.update()
        ref_curve.append({name: collector.mean(name)
                          for name in ("Loss/G/loss", "Loss/D/loss",
                                       "Loss/scores/fake", "Loss/scores/real")
                          if collector.num(name) > 0})

    # ---- per-step curve agreement over the fp-coherent window.  Beyond
    # ~6 steps beta1=0 Adam sign-chaos on fp-noise-level gradients makes
    # per-step equality meaningless (see module docstring); the semantic
    # check for the full gradient tree is
    # test_sg2_phase_gradients_match_reference.
    for i, (ref_m, our_m) in enumerate(zip(ref_curve[:6], ours_curve[:6])):
        for name, want in ref_m.items():
            got = our_m[name]
            np.testing.assert_allclose(
                got, want, rtol=5e-2, atol=1.5e-2,
                err_msg=f"step {i} {name}: ours={got} ref={want}")

    # ---- full-window means: the chaotic trajectories must stay in the
    # same band (a semantic difference, e.g. a wrong lr or a dropped loss
    # term, shifts the mean far beyond fp divergence).
    for name in ("Loss/G/loss", "Loss/D/loss", "Loss/scores/fake",
                 "Loss/scores/real"):
        want = float(np.mean([m[name] for m in ref_curve if name in m]))
        got = float(np.mean([m[name] for m in ours_curve if name in m]))
        assert abs(got - want) < 0.1, f"{name}: mean ours={got} ref={want}"

    # pl_mean EMA tracked identically (slow EMA of a batch statistic —
    # robust to the param-level chaos).
    np.testing.assert_allclose(float(state.pl_mean),
                               float(loss_ref.pl_mean), rtol=2e-2, atol=1e-3)


def test_sg2_training_dynamics_statistical_with_ada():
    """1000 steps of the PRODUCTION recipe (ADA medical augment +
    controller, style mixing 0.9, random synthesis noise), each side using
    its own RNG: score trajectories, penalty magnitudes, and the ADA-p
    trajectory agree under CI-based equivalence bands (VERDICT r4 #6 —
    the earlier 240-step 0.35-absolute / 0.2–5× bands were smoke-level;
    these use 5 approx-independent 100-step tail blocks per side and a
    3σ two-sample band plus a small systematic floor, i.e. the test's
    power is carried by the measured run-to-run variance itself)."""
    res, cbase, cmax, batch, steps = 16, 128, 32, 8, 1000
    ada_target, ada_interval, ada_kimg = 0.6, 4, 2.0
    g_ref, d_ref, g_ema_ref, g, d = _build_pair(res, cbase, cmax, mbstd_group=2)
    loss_mod = import_reference_module("training.loss")
    stats_mod = import_reference_module("torch_utils.training_stats")
    aug_mod = import_reference_module("training.augment_mi")

    aug_kwargs = dict(xflip=1, xint=1, xint_max=0.05,
                      scale=1, rotate=1, rotate_max=3.0 / 360.0,
                      aniso=1, xfrac=1,
                      scale_std=0.05, aniso_std=0.05, xfrac_std=0.05)
    pipe_ref = aug_mod.AugmentPipe(run_dir="/tmp", batch_size=batch,
                                   **aug_kwargs)
    pipe_ref.p.copy_(torch.zeros([]))
    loss_ref = loss_mod.StyleGAN2Loss(
        device=torch.device("cpu"), G=g_ref, D=d_ref, augment_pipe=pipe_ref,
        r1_gamma=1.0, style_mixing_prob=0.9, pl_weight=2.0, pl_batch_shrink=2)
    opt_g_ref, opt_d_ref = _ref_optimizers(g_ref, d_ref)

    from gantrack_tpu.training.augment import AugmentPipe, medical_augment_config

    opt_g = lazy_reg_adam(LR, betas=BETAS, reg_interval=G_INT)
    opt_d = lazy_reg_adam(LR, betas=BETAS, reg_interval=D_INT)
    state = create_train_state(
        g, d, jax.random.PRNGKey(0), opt_g, opt_d,
        z_dim=ZDIM, c_dim=0, img_resolution=res, img_channels=1)
    state = transplant_into_state(state, g_ref, d_ref, g_ema_ref)
    augment_fn = AugmentPipe(medical_augment_config(), res, res, 1,
                             impl="gather", compute_dtype=jnp.float32)
    loss = StyleGAN2Loss(g, d, StyleGAN2LossConfig(
        r1_gamma=1.0, style_mixing_prob=0.9, pl_weight=2.0, pl_batch_shrink=2,
        noise_mode="random"), augment_fn=augment_fn)
    cfg = TrainStepConfig(batch_size=batch, z_dim=ZDIM, c_dim=0,
                          g_reg_interval=G_INT, d_reg_interval=D_INT,
                          ada_target=ada_target, ada_interval=ada_interval,
                          ada_kimg=ada_kimg)
    mesh = create_mesh(1)
    stepper = TrainStepper(loss, opt_g, opt_d, cfg, mesh)

    rng = np.random.default_rng(11)
    # A tiny fixed "dataset" of smooth blobs so D has real structure to
    # separate — pure-noise reals make sign(D_real) a coin flip.
    xs, ys = np.meshgrid(np.arange(res), np.arange(res))
    data = np.stack([
        np.exp(-(((xs - a) ** 2 + (ys - b) ** 2) / (2.0 * s ** 2)))
        for a, b, s in rng.uniform(4, res - 4, (64, 3)) * [1, 1, 0.25]
    ]).astype(np.float32)[..., None] * 2 - 1

    ours = {"signs_real": [], "scores_fake": [], "r1": [], "pl": [], "p": []}
    for i in range(steps):
        batch_imgs = data[rng.integers(0, len(data), batch)]
        state, moments = stepper(state, shard_batch(mesh, jnp.asarray(batch_imgs)))
        m = {k: float(v[1] / v[0]) for k, v in moments.items()}
        ours["signs_real"].append(m["Loss/signs/real"])
        ours["scores_fake"].append(m["Loss/scores/fake"])
        if "Loss/r1_penalty" in m:
            ours["r1"].append(m["Loss/r1_penalty"])
        if "Loss/pl_penalty" in m:
            ours["pl"].append(m["Loss/pl_penalty"])
        ours["p"].append(float(state.ada_p))

    torch.manual_seed(123)
    collector = stats_mod.Collector(regex="Loss/.*")
    ada_stats = stats_mod.Collector(regex="Loss/signs/real")
    ref = {"signs_real": [], "scores_fake": [], "r1": [], "pl": [], "p": []}
    rng2 = np.random.default_rng(11)
    _ = rng2.uniform(4, res - 4, (64, 3))  # consume the dataset draw
    cur_nimg = 0
    for i in range(steps):
        batch_imgs = data[rng2.integers(0, len(data), batch)]
        real = _t(batch_imgs)
        real_c = torch.zeros(batch, 0)
        zc = torch.zeros(batch, 0)
        z = lambda: torch.randn(batch, ZDIM)
        _ref_phase_step(loss_ref, g_ref, opt_g_ref, "Gmain", real, real_c,
                        z(), zc, 1.0, cur_nimg)
        if i % G_INT == 0:
            _ref_phase_step(loss_ref, g_ref, opt_g_ref, "Greg", real, real_c,
                            z(), zc, float(G_INT), cur_nimg)
        _ref_phase_step(loss_ref, d_ref, opt_d_ref, "Dmain", real, real_c,
                        z(), zc, 1.0, cur_nimg)
        if i % D_INT == 0:
            _ref_phase_step(loss_ref, d_ref, opt_d_ref, "Dreg", real, real_c,
                            z(), zc, float(D_INT), cur_nimg)
        cur_nimg += batch
        # ADA heuristic (training_loop:374-376), after batch_idx increment.
        if (i + 1) % ada_interval == 0:
            ada_stats.update()
            adjust = (np.sign(ada_stats.mean("Loss/signs/real") - ada_target)
                      * (batch * ada_interval) / (ada_kimg * 1000))
            pipe_ref.p.copy_((pipe_ref.p + adjust).max(torch.zeros([])))
        collector.update()
        ref["signs_real"].append(collector.mean("Loss/signs/real"))
        ref["scores_fake"].append(collector.mean("Loss/scores/fake"))
        if collector.num("Loss/r1_penalty") > 0 and i % D_INT == 0:
            ref["r1"].append(collector.mean("Loss/r1_penalty"))
        if collector.num("Loss/pl_penalty") > 0 and i % G_INT == 0:
            ref["pl"].append(collector.mean("Loss/pl_penalty"))
        ref["p"].append(float(pipe_ref.p))

    w = steps // 2  # compare the second half (past the initial transient)
    K = 5           # tail blocks per side (approx independent at 100 steps)

    def blocks(xs):
        tail = np.asarray(xs, np.float64)[-w:]
        return tail.reshape(K, -1).mean(axis=1)

    def assert_equivalent(key, o_series, r_series, floor):
        """|Δmean| ≤ 3·SE(Δ) + floor, with SE from the measured block
        variance of BOTH sides — the band scales with the dynamics' own
        run-to-run noise instead of a fixed smoke tolerance."""
        ob, rb = blocks(o_series), blocks(r_series)
        se = float(np.sqrt(ob.var(ddof=1) / K + rb.var(ddof=1) / K))
        delta = abs(float(ob.mean() - rb.mean()))
        assert delta <= 3 * se + floor, (
            key, dict(ours=float(ob.mean()), ref=float(rb.mean()),
                      delta=delta, band=3 * se + floor, se=se))

    # sign(D(real)) running mean — the ADA feedback signal itself.
    assert_equivalent("signs_real", ours["signs_real"], ref["signs_real"],
                      floor=0.06)
    # fake scores in the same band.
    assert_equivalent("scores_fake", ours["scores_fake"], ref["scores_fake"],
                      floor=0.25)
    # penalty magnitudes: equivalence on log-medians (scale parity);
    # floor 0.35 ≈ a 1.4× ratio vs the old 0.2–5× smoke band.
    for key in ("r1", "pl"):
        o = np.log(np.asarray(ours[key], np.float64)[-len(ours[key]) // 2:] + 1e-8)
        r = np.log(np.asarray(ref[key], np.float64)[-len(ref[key]) // 2:] + 1e-8)
        ob = o[: len(o) - len(o) % K].reshape(K, -1).mean(axis=1)
        rb = r[: len(r) - len(r) % K].reshape(K, -1).mean(axis=1)
        se = float(np.sqrt(ob.var(ddof=1) / K + rb.var(ddof=1) / K))
        delta = abs(float(ob.mean() - rb.mean()))
        assert delta <= 3 * se + 0.35, (
            key, dict(log_ours=float(ob.mean()), log_ref=float(rb.mean()),
                      delta=delta, band=3 * se + 0.35))
    # ADA-p trajectories: same controller responding to its own signal —
    # tail means within 0.1 (was: endpoints within 0.3).
    assert_equivalent("ada_p", ours["p"], ref["p"], floor=0.08)
