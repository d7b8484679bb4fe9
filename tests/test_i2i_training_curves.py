"""CycleGAN / pix2pix TRAINING-dynamics validation vs the reference.

Forward transplant parity (test_i2i_parity.py) proves the networks; these
tests prove the *training path*: with transplanted init, identical fixed
batches and deterministic configs (pool_size=0, no dropout), N optimisation
steps in this framework and in a torch loop implementing the reference's
``optimize_parameters`` semantics (``cycle_gan_model.py:155-171``,
``pix2pix_model.py:103-116``) must produce matching loss trajectories and
final parameters.  Also covers the wgangp ``cal_gradient_penalty`` path
(``networks.py:278-312``).
"""

import functools
import importlib.util
import itertools
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference/src/models/pytorch-CycleGAN-and-pix2pix/models/networks.py"
requires_reference = pytest.mark.skipif(not os.path.isfile(REF),
                                        reason="reference tree not present")

SIZE = 32
BATCH = 2
STEPS = 3


def _ref_networks():
    spec = importlib.util.spec_from_file_location("cyclegan_networks", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _inorm():
    return functools.partial(torch.nn.InstanceNorm2d, affine=False,
                             track_running_stats=False)


def _batches(seed, n=STEPS):
    rng = np.random.default_rng(seed)
    return [
        (rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32),
         rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32))
        for _ in range(n)
    ]


def _t(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def _set_requires_grad(nets, flag):
    for net in nets:
        for p in net.parameters():
            p.requires_grad_(flag)


@requires_reference
@pytest.mark.slow
def test_cyclegan_training_curve_matches_reference():
    """3 optimisation steps of the full CycleGAN recipe (lsgan, cycle λ=10,
    identity λ_idt=0.5, Adam(2e-4, β1=0.5), pool_size=0): per-step
    G/D_A/D_B losses and final G_A parameters match the reference update
    semantics (G first vs old Ds, then both Ds on detached fakes)."""
    from gantrack_tpu.models.torch_compat import (
        nlayer_discriminator_params_from_torch,
        resnet_generator_params_from_torch,
    )
    from gantrack_tpu.training.image2image import CycleGANConfig, CycleGANTrainer

    nets = _ref_networks()
    torch.manual_seed(0)
    norm = _inorm()
    g_a = nets.ResnetGenerator(3, 3, ngf=8, norm_layer=norm, n_blocks=6)
    g_b = nets.ResnetGenerator(3, 3, ngf=8, norm_layer=norm, n_blocks=6)
    d_a = nets.NLayerDiscriminator(3, ndf=8, n_layers=3, norm_layer=norm)
    d_b = nets.NLayerDiscriminator(3, ndf=8, n_layers=3, norm_layer=norm)
    crit = nets.GANLoss("lsgan")
    l1 = torch.nn.L1Loss()
    opt_g = torch.optim.Adam(itertools.chain(g_a.parameters(), g_b.parameters()),
                             lr=2e-4, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(itertools.chain(d_a.parameters(), d_b.parameters()),
                             lr=2e-4, betas=(0.5, 0.999))

    batches = _batches(0)

    # ---- torch loop: the reference cycle_gan_model.optimize_parameters
    # semantics (G update vs frozen Ds, then D updates on detached fakes;
    # pool_size=0 means the pool returns its input unchanged).
    torch_curve = []
    for a_np, b_np in batches:
        a, b = _t(a_np), _t(b_np)
        fake_b = g_a(a)
        rec_a = g_b(fake_b)
        fake_a = g_b(b)
        rec_b = g_a(fake_a)
        _set_requires_grad([d_a, d_b], False)
        opt_g.zero_grad()
        idt_a = g_a(b)
        idt_b = g_b(a)
        loss_g = (l1(idt_a, b) * 10.0 * 0.5 + l1(idt_b, a) * 10.0 * 0.5
                  + crit(d_a(fake_b), True) + crit(d_b(fake_a), True)
                  + l1(rec_a, a) * 10.0 + l1(rec_b, b) * 10.0)
        loss_g.backward()
        opt_g.step()
        _set_requires_grad([d_a, d_b], True)
        opt_d.zero_grad()
        loss_d_a = (crit(d_a(b), True) + crit(d_a(fake_b.detach()), False)) * 0.5
        loss_d_a.backward()
        loss_d_b = (crit(d_b(a), True) + crit(d_b(fake_a.detach()), False)) * 0.5
        loss_d_b.backward()
        opt_d.step()
        torch_curve.append((float(loss_g), float(loss_d_a), float(loss_d_b)))

    # ---- this framework, transplanted init, same batches.
    torch.manual_seed(0)  # rebuild identical init for transplant
    g_a2 = nets.ResnetGenerator(3, 3, ngf=8, norm_layer=norm, n_blocks=6)
    g_b2 = nets.ResnetGenerator(3, 3, ngf=8, norm_layer=norm, n_blocks=6)
    d_a2 = nets.NLayerDiscriminator(3, ndf=8, n_layers=3, norm_layer=norm)
    d_b2 = nets.NLayerDiscriminator(3, ndf=8, n_layers=3, norm_layer=norm)

    cfg = CycleGANConfig(ngf=8, ndf=8, netG="resnet_6blocks", gan_mode="lsgan",
                         pool_size=0)
    trainer = CycleGANTrainer(cfg, image_size=SIZE)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = state.replace(
        params_g_a=jax.tree.map(jnp.asarray,
                                resnet_generator_params_from_torch(g_a2, n_blocks=6)),
        params_g_b=jax.tree.map(jnp.asarray,
                                resnet_generator_params_from_torch(g_b2, n_blocks=6)),
        params_d_a=jax.tree.map(jnp.asarray,
                                nlayer_discriminator_params_from_torch(d_a2)),
        params_d_b=jax.tree.map(jnp.asarray,
                                nlayer_discriminator_params_from_torch(d_b2)),
    )

    jax_curve = []
    for a_np, b_np in batches:
        state, losses = trainer.optimize_parameters(state, a_np, b_np)
        jax_curve.append((losses["G"], losses["D_A"], losses["D_B"]))

    for step, (want, got) in enumerate(zip(torch_curve, jax_curve)):
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4,
                                   err_msg=f"step {step}: torch {want} jax {got}")

    # Final G_A parameters track the torch trajectory.  Adam moves each
    # element ±lr per step and sign-amplifies fp noise on near-zero-grad
    # elements, so the bound is a few flips' worth (the per-step LOSS
    # asserts above are the tight dynamics check — step-3 losses depend on
    # steps 1-2 updates of all four networks).
    want_params = resnet_generator_params_from_torch(g_a, n_blocks=6)
    got_flat = jax.tree.leaves(state.params_g_a)
    want_flat = jax.tree.leaves(jax.tree.map(np.asarray, want_params))
    for g_arr, w_arr in zip(got_flat, want_flat):
        np.testing.assert_allclose(np.asarray(g_arr), w_arr, atol=1.5e-3)


@requires_reference
@pytest.mark.slow
def test_pix2pix_training_curve_matches_reference():
    """3 steps of pix2pix (vanilla cGAN + L1 λ=100, no dropout): the
    reference updates D FIRST against the detached current fake, then G
    against the *updated* D (``pix2pix_model.py:103-116``) — losses and
    final parameters must match under that ordering."""
    from gantrack_tpu.models.torch_compat import (
        nlayer_discriminator_params_from_torch,
        resnet_generator_params_from_torch,
    )
    from gantrack_tpu.training.image2image import Pix2PixConfig, Pix2PixTrainer

    nets = _ref_networks()
    torch.manual_seed(1)
    norm = _inorm()
    g = nets.ResnetGenerator(3, 3, ngf=8, norm_layer=norm, n_blocks=6,
                             use_dropout=False)
    d = nets.NLayerDiscriminator(6, ndf=8, n_layers=3, norm_layer=norm)
    crit = nets.GANLoss("vanilla")
    l1 = torch.nn.L1Loss()
    opt_g = torch.optim.Adam(g.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(d.parameters(), lr=2e-4, betas=(0.5, 0.999))

    batches = _batches(1)

    torch_curve = []
    for a_np, b_np in batches:
        a, b = _t(a_np), _t(b_np)
        fake_b = g(a)
        _set_requires_grad([d], True)
        opt_d.zero_grad()
        loss_d = (crit(d(torch.cat([a, fake_b.detach()], 1)), False)
                  + crit(d(torch.cat([a, b], 1)), True)) * 0.5
        loss_d.backward()
        opt_d.step()
        _set_requires_grad([d], False)
        opt_g.zero_grad()
        loss_g = (crit(d(torch.cat([a, fake_b], 1)), True)
                  + l1(fake_b, b) * 100.0)
        loss_g.backward()
        opt_g.step()
        torch_curve.append((float(loss_g), float(loss_d)))

    torch.manual_seed(1)
    g2 = nets.ResnetGenerator(3, 3, ngf=8, norm_layer=norm, n_blocks=6,
                              use_dropout=False)
    d2 = nets.NLayerDiscriminator(6, ndf=8, n_layers=3, norm_layer=norm)

    cfg = Pix2PixConfig(ngf=8, ndf=8, netG="resnet_6blocks",
                        gan_mode="vanilla", no_dropout=True)
    trainer = Pix2PixTrainer(cfg, image_size=SIZE)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = state.replace(
        params_g=jax.tree.map(jnp.asarray,
                              resnet_generator_params_from_torch(g2, n_blocks=6)),
        params_d=jax.tree.map(jnp.asarray,
                              nlayer_discriminator_params_from_torch(d2)),
    )

    jax_curve = []
    for a_np, b_np in batches:
        state, losses = trainer.optimize_parameters(state, a_np, b_np)
        jax_curve.append((losses["G"], losses["D"]))

    for step, (want, got) in enumerate(zip(torch_curve, jax_curve)):
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4,
                                   err_msg=f"step {step}: torch {want} jax {got}")

    # Loose bound only — see the CycleGAN test's comment on Adam noise.
    want_params = resnet_generator_params_from_torch(g, n_blocks=6)
    for g_arr, w_arr in zip(jax.tree.leaves(state.params_g),
                            jax.tree.leaves(jax.tree.map(np.asarray, want_params))):
        np.testing.assert_allclose(np.asarray(g_arr), w_arr, atol=1.5e-3)


@requires_reference
def test_wgangp_gradient_penalty_matches_reference():
    """``gradient_penalty`` == the reference ``cal_gradient_penalty``
    (``networks.py:278-312``) on the deterministic 'real'/'fake' modes with
    a transplanted PatchGAN D, and is differentiable wrt D params (the
    double-backprop the wgangp D loss needs)."""
    from gantrack_tpu.models.image2image import NLayerDiscriminator, gradient_penalty
    from gantrack_tpu.models.torch_compat import nlayer_discriminator_params_from_torch

    nets = _ref_networks()
    torch.manual_seed(2)
    d_ref = nets.NLayerDiscriminator(3, ndf=8, n_layers=3, norm_layer=_inorm())
    d = NLayerDiscriminator(ndf=8, n_layers=3)
    params = jax.tree.map(jnp.asarray, nlayer_discriminator_params_from_torch(d_ref))

    rng = np.random.default_rng(3)
    real = rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32)
    fake = rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3)).astype(np.float32)

    def d_apply(p, x):
        return d.apply({"params": p}, x)

    for mode, data in (("real", real), ("fake", fake)):
        want, _ = nets.cal_gradient_penalty(
            d_ref, _t(real).requires_grad_(True), _t(fake), "cpu", type=mode)
        got = gradient_penalty(d_apply, params, jnp.asarray(real),
                               jnp.asarray(fake), type=mode)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-3, atol=1e-4)

    # mixed mode: finite, positive, and differentiable wrt D params.
    def loss_fn(p):
        return gradient_penalty(d_apply, p, jnp.asarray(real), jnp.asarray(fake),
                                rng=jax.random.PRNGKey(0), type="mixed")

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val)) and float(val) >= 0
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
