"""End-to-end training-step tests on the 8-device virtual CPU mesh:
state updates, all 4 phase variants, ADA controller, mesh-size invariance
(the replacement for the reference's check_ddp_consistency, SURVEY §4d)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gantrack_tpu.models.stylegan2 import Discriminator, Generator
from gantrack_tpu.parallel.mesh import create_mesh, shard_batch
from gantrack_tpu.training import (
    GANTrainState,
    StyleGAN2Loss,
    StyleGAN2LossConfig,
    TrainStepConfig,
    TrainStepper,
    create_train_state,
    lazy_reg_adam,
)

pytestmark = pytest.mark.slow  # 8-device virtual-mesh compiles dominate

RES = 16
ZDIM = 8


def _setup(num_devices, batch=8):
    g = Generator(
        z_dim=ZDIM, c_dim=0, w_dim=ZDIM, img_resolution=RES, img_channels=1,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=128, channel_max=32, num_fp16_res=0),
    )
    d = Discriminator(
        c_dim=0, img_resolution=RES, img_channels=1,
        channel_base=128, channel_max=32, num_fp16_res=0,
        epilogue_kwargs=dict(mbstd_group_size=2),
    )
    opt_g = lazy_reg_adam(0.002, reg_interval=4)
    opt_d = lazy_reg_adam(0.002, reg_interval=16)
    state = create_train_state(
        g, d, jax.random.PRNGKey(0), opt_g, opt_d,
        z_dim=ZDIM, c_dim=0, img_resolution=RES, img_channels=1,
    )
    loss = StyleGAN2Loss(g, d, StyleGAN2LossConfig(r1_gamma=1.0, pl_weight=2.0))
    cfg = TrainStepConfig(batch_size=batch, z_dim=ZDIM, ada_target=0.6)
    mesh = create_mesh(num_devices)
    stepper = TrainStepper(loss, opt_g, opt_d, cfg, mesh)
    return state, stepper, mesh


def _fake_batch(batch=8):
    rng = np.random.default_rng(0)
    return rng.standard_normal((batch, RES, RES, 1)).astype(np.float32)


def test_train_step_runs_and_updates():
    state, stepper, mesh = _setup(num_devices=2)
    img = shard_batch(mesh, jnp.asarray(_fake_batch()))
    p0 = jax.tree.leaves(state.params_g)[0].copy()
    state1, moments = stepper(state, img)
    assert int(state1.step) == 1
    assert int(state1.cur_nimg) == 8
    assert not np.allclose(np.asarray(jax.tree.leaves(state1.params_g)[0]), np.asarray(p0))
    assert "Loss/G/loss" in moments and "Loss/D/loss" in moments
    # step 0 runs both regs (0 % interval == 0)
    assert "Loss/pl_penalty" in moments and "Loss/r1_penalty" in moments
    for name, m in moments.items():
        assert np.all(np.isfinite(np.asarray(m))), name


def test_phase_schedule():
    state, stepper, mesh = _setup(num_devices=1)
    img = jnp.asarray(_fake_batch())
    state, m0 = stepper(state, img)       # step 0: both regs
    state, m1 = stepper(state, img)       # step 1: no regs
    assert "Loss/pl_penalty" in m0 and "Loss/r1_penalty" in m0
    assert "Loss/pl_penalty" not in m1 and "Loss/r1_penalty" not in m1
    for _ in range(3):
        state, m = stepper(state, img)    # steps 2,3,4 — step 4 has Greg
    assert "Loss/pl_penalty" in m and "Loss/r1_penalty" not in m


def _spy_phase_flags(stepper):
    """Record the (do_gpl, do_dr1) variant each dispatch selects."""
    seen = []
    orig = stepper.get

    def spy(do_gpl, do_dr1):
        seen.append((do_gpl, do_dr1))
        return orig(do_gpl, do_dr1)

    stepper.get = spy
    return seen


def test_phase_cadence_resyncs_after_restore():
    """A checkpoint restored mid-interval continues the Greg/Dreg cadence on
    the correct steps: the host step-mirror resyncs whenever the incoming
    state is not the object this stepper produced (VERDICT r3 weak #5 — the
    old ``id(state)`` heuristic could be fooled by CPython id recycling)."""
    state, stepper, mesh = _setup(num_devices=1)
    img = jnp.asarray(_fake_batch())

    # Advance to step 3 and stash a "checkpoint" (same values, NEW object —
    # exactly what an orbax restore produces).
    for _ in range(3):
        state, _ = stepper(state, img)
    ckpt = jax.tree.map(lambda x: jnp.array(x), state)
    assert int(ckpt.step) == 3

    # Keep training past the checkpoint so the mirror moves ahead.
    for _ in range(4):
        state, _ = stepper(state, img)
    assert stepper._host_step == 7

    # "Restore": feed the checkpointed state to the same stepper.  Step 3 is
    # mid-interval (3 % 4 != 0); step 4 must run Greg, step 16 Dreg.
    seen = _spy_phase_flags(stepper)
    st = ckpt
    for _ in range(3, 17):
        st, _ = stepper(st, img)
    expect = [(s % 4 == 0, s % 16 == 0) for s in range(3, 17)]
    assert seen == expect
    assert int(st.step) == 17


def test_phase_cadence_two_steppers_share_state():
    """Two steppers alternating on one state stream each resync via
    ``int(state.step)`` instead of silently reusing a stale host mirror."""
    state, stepper_a, mesh = _setup(num_devices=1)
    _, stepper_b, _ = _setup(num_devices=1)
    img = jnp.asarray(_fake_batch())
    seen_a = _spy_phase_flags(stepper_a)
    seen_b = _spy_phase_flags(stepper_b)
    for i in range(6):
        stepper = stepper_a if i % 2 == 0 else stepper_b
        state, _ = stepper(state, img)
    assert seen_a == [(s % 4 == 0, s % 16 == 0) for s in (0, 2, 4)]
    assert seen_b == [(s % 4 == 0, s % 16 == 0) for s in (1, 3, 5)]


def test_ada_controller_updates_p():
    state, stepper, mesh = _setup(num_devices=1)
    img = jnp.asarray(_fake_batch())
    ps = []
    for _ in range(8):
        state, _ = stepper(state, img)
        ps.append(float(state.ada_p))
    # p only changes on every ada_interval-th batch and stays >= 0
    assert ps[0] == ps[1] == ps[2]
    assert all(p >= 0 for p in ps)


def _setup_invariance(num_devices, batch=8, c_dim=0, label_bank=None,
                      production=False):
    """Stepper in ``rng_mode='global_sample'``: per-sample draws keyed by
    global sample index, pl_batch_shrink=1 — the only remaining mesh-size
    dependence is the collectives themselves.

    ``production=True`` runs the full production step shape: ADA augment
    pipe ON (per-sample draws keyed by global index), Adam optimizer, and
    random per-layer synthesis noise — the configuration VERDICT r3 noted
    was excluded from the invariance check.
    """
    import optax

    g = Generator(
        z_dim=ZDIM, c_dim=c_dim, w_dim=ZDIM, img_resolution=RES, img_channels=1,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=128, channel_max=32, num_fp16_res=0),
    )
    d = Discriminator(
        c_dim=c_dim, img_resolution=RES, img_channels=1,
        channel_base=128, channel_max=32, num_fp16_res=0,
        # mbstd groups are *local-batch* strided in the reference
        # (networks_stylegan2.py:644-668 — groups never cross GPUs), so the
        # feature is inherently mesh-size dependent; invariance is only
        # defined with it off.
        epilogue_kwargs=dict(mbstd_group_size=2, mbstd_num_channels=0),
    )
    if production:
        opt_g = lazy_reg_adam(0.0025, reg_interval=4)
        opt_d = lazy_reg_adam(0.0025, reg_interval=16)
    else:
        # SGD keeps updates linear in the pmean'd grads, so a missing/
        # incorrect collective shows up at tight tolerance (Adam's rsqrt
        # normalisation amplifies fp noise near zero-gradient elements).
        opt_g = optax.sgd(0.01)
        opt_d = optax.sgd(0.01)
    state = create_train_state(
        g, d, jax.random.PRNGKey(0), opt_g, opt_d,
        z_dim=ZDIM, c_dim=c_dim, img_resolution=RES, img_channels=1,
    )
    augment_fn = None
    if production:
        from gantrack_tpu.training.augment import (
            AugmentPipe, medical_augment_config,
        )

        augment_fn = AugmentPipe(medical_augment_config(), RES, RES, 1,
                                 impl="gather", compute_dtype=jnp.float32)
        # ADA gates never fire at p=0; exercise the pipe for real.
        state = state.replace(ada_p=jnp.asarray(0.7, jnp.float32))
    loss = StyleGAN2Loss(
        g, d,
        StyleGAN2LossConfig(
            r1_gamma=1.0, pl_weight=2.0, pl_batch_shrink=1,
            noise_mode="random" if production else "const"),
        augment_fn=augment_fn,
    )
    cfg = TrainStepConfig(batch_size=batch, z_dim=ZDIM, c_dim=c_dim,
                          ada_target=0.6, rng_mode="global_sample")
    mesh = create_mesh(num_devices)
    stepper = TrainStepper(loss, opt_g, opt_d, cfg, mesh,
                           label_bank=label_bank)
    return state, stepper, mesh


@pytest.mark.parametrize("do_gpl,do_dr1",
                         [(False, False), (True, False), (False, True),
                          (True, True)])
def test_mesh_size_invariance(do_gpl, do_dr1):
    """1-device and 4-device runs of the SAME global batch produce
    numerically equal updates for every phase variant — real psum/pmean
    correctness (replaces reference check_ddp_consistency,
    ``torch_utils/misc.py:180-191``).  A pmean that sums without dividing,
    or a dropped reduction on grads / pl_mean / emas / ADA moments, fails
    the allclose below (per-device data and per-sample RNG genuinely
    differ across shards)."""
    batch = 8
    img = _fake_batch(batch)
    zc = jnp.zeros((batch, 0), jnp.float32)

    results = []
    for n_dev in (1, 4):
        state, stepper, mesh = _setup_invariance(num_devices=n_dev, batch=batch)
        sharded = shard_batch(mesh, jnp.asarray(img))
        new_state, moments = stepper.get(do_gpl, do_dr1)(state, sharded, zc)
        results.append((
            jax.tree.map(np.asarray, jax.device_get(
                (new_state.params_g, new_state.params_d,
                 new_state.params_g_ema, new_state.emas_g))),
            float(new_state.pl_mean), float(new_state.ada_p),
            np.asarray(new_state.ada_signs),
            {k: np.asarray(v) for k, v in moments.items()},
        ))

    (trees0, pl0, ada0, signs0, m0), (trees1, pl1, ada1, signs1, m1) = results
    # Tolerance: a wrong collective (psum without /n, dropped pmean) gives
    # O(1) relative error; fp32 reassociation between "one 8-sample mean"
    # and "pmean of four 2-sample means" gives ≤1e-5 abs — amplified
    # through the double-backprop PL phase.  2e-5/5e-3 cleanly separates
    # the two regimes.
    for a, b in zip(jax.tree.leaves(trees0), jax.tree.leaves(trees1)):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=2e-5)
    np.testing.assert_allclose(pl0, pl1, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(ada0, ada1, rtol=0, atol=0)
    np.testing.assert_allclose(signs0, signs1, rtol=1e-6, atol=1e-6)
    # psum'd training-stats moments (n, Σ, Σ²) must also agree globally.
    assert set(m0) == set(m1)
    for name in m0:
        np.testing.assert_allclose(m0[name], m1[name], rtol=1e-4, atol=1e-5,
                                   err_msg=name)


@pytest.mark.parametrize("do_gpl,do_dr1", [(False, False), (True, True)])
def test_mesh_size_invariance_production_step(do_gpl, do_dr1):
    """The invariance check on the PRODUCTION configuration: ADA augment
    pipe ON (all 18-aug gate/transform draws keyed by global sample index),
    Adam optimizer, random per-layer synthesis noise.  The augment pipe is
    the subsystem most saturated with batch-shaped RNG and the psum'd ADA
    feedback — a reduction bug there passes the const-noise/no-augment
    variants but fails here (VERDICT r3 missing #3)."""
    batch = 8
    img = _fake_batch(batch)
    zc = jnp.zeros((batch, 0), jnp.float32)

    results = []
    for n_dev in (1, 4):
        state, stepper, mesh = _setup_invariance(
            num_devices=n_dev, batch=batch, production=True)
        sharded = shard_batch(mesh, jnp.asarray(img))
        new_state, moments = stepper.get(do_gpl, do_dr1)(state, sharded, zc)
        results.append((
            jax.tree.map(np.asarray, jax.device_get(
                (new_state.params_g, new_state.params_d,
                 new_state.params_g_ema, new_state.emas_g))),
            float(new_state.pl_mean), float(new_state.ada_p),
            np.asarray(new_state.ada_signs),
            {k: np.asarray(v) for k, v in moments.items()},
        ))

    (trees0, pl0, ada0, signs0, m0), (trees1, pl1, ada1, signs1, m1) = results
    # Adam's rsqrt amplifies fp32 reassociation noise on near-zero-grad
    # elements, so the params band stays 5e-3 relative with a wider atol
    # than the SGD variant (updates are O(lr)=2.5e-3); a wrong collective
    # is still O(1).  The ADA sign moments must agree exactly: they are
    # integer counts of sign(D(real)) psum'd across shards.
    for a, b in zip(jax.tree.leaves(trees0), jax.tree.leaves(trees1)):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-5)
    np.testing.assert_allclose(pl0, pl1, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(ada0, ada1, rtol=0, atol=0)
    np.testing.assert_allclose(signs0, signs1, rtol=0, atol=0)
    assert set(m0) == set(m1)
    for name in m0:
        np.testing.assert_allclose(m0[name], m1[name], rtol=1e-3, atol=1e-4,
                                   err_msg=name)


def test_mesh_size_invariance_conditional():
    """Same check through the conditional path (label bank sampling)."""
    batch = 8
    img = _fake_batch(batch)
    bank = jnp.asarray(np.eye(3, dtype=np.float32)[[0, 0, 1, 2, 2, 2]])
    real_c = jnp.asarray(np.eye(3, dtype=np.float32)[
        np.random.default_rng(1).integers(0, 3, batch)])

    results = []
    for n_dev in (1, 4):
        state, stepper, mesh = _setup_invariance(
            num_devices=n_dev, batch=batch, c_dim=3, label_bank=bank)
        sharded = shard_batch(mesh, jnp.asarray(img))
        c_sh = shard_batch(mesh, real_c)
        new_state, _ = stepper.get(False, False)(state, sharded, c_sh)
        results.append(jax.tree.map(np.asarray, jax.device_get(
            (new_state.params_g, new_state.params_d))))

    for a, b in zip(jax.tree.leaves(results[0]), jax.tree.leaves(results[1])):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-6)


def test_w_avg_and_pl_mean_evolve():
    state, stepper, mesh = _setup(num_devices=2)
    img = shard_batch(mesh, jnp.asarray(_fake_batch()))
    w0 = np.asarray(state.emas_g["mapping"]["w_avg"]).copy()
    state, _ = stepper(state, img)
    assert not np.allclose(np.asarray(state.emas_g["mapping"]["w_avg"]), w0)
    assert np.isfinite(float(state.pl_mean))


@pytest.mark.parametrize("mode", ["tiny", "real-models"])
def test_invariance_f64_pin(mode):
    """The float64 mesh-size-invariance pin (VERDICT r3 weak #6, r4 #5):
    the f32 invariance band (5e-3) could in principle hide a subtly-wrong
    reduction on a small term; this drives the REAL step machinery
    (TrainStepper / StyleGAN2Loss / AugmentPipe, all four phases, Adam,
    per-sample-keyed augment + noise) through float64 G/D and requires
    1-dev == 4-dev at 1e-9, where fp reassociation (~1e-15) cannot mask
    anything.  ``tiny`` uses f64 stand-in G/D (fast); ``real-models``
    runs the actual SG2 Generator/Discriminator — modulated_conv2d with
    demod statistics, conv2d_resample, upfirdn2d, eq-LR, per-sample
    noise — under ``precision.pinned_float64``, plus an mbstd NumPy-f64
    oracle (mbstd itself is per-replica by design, as in the reference).

    Runs as a subprocess because x64 must be enabled before JAX init.
    This pin is what caught the shape-dependent f32 accumulation in the
    FIR banded matmul (ops/upfirdn2d.py) and the f32 coordinate
    rematerialisation in the warp VJP (ops/grid_sample.py)."""
    import subprocess
    import sys as _sys

    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "invariance_f64.py")
    cmd = [_sys.executable, script]
    if mode == "real-models":
        cmd.append("--real-models")
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "F64 INVARIANCE OK" in proc.stdout, proc.stdout
    if mode == "real-models":
        assert "mbstd f64 oracle OK" in proc.stdout, proc.stdout
