"""Measure --metric-async + --metric-snap overhead at Gan-track's own
cadence (--snap=10 --tick=4 ⇒ fid10k per 40 kimg), VERDICT r4 #8.

Method: time K plain train steps alone (t_base), then start the fid10k
generator-feature extraction in a background thread (exactly what
``training_loop(metric_async=True)`` does) and time train-step windows
until it completes (t_contended, d_wall).  On a single chip the device
serializes both programs, so async can only hide HOST-side time and
pipeline bubbles; the residual slowdown is the true async cost.  The
snapshot interval is 1250 steps (40 kimg / batch 32); overhead models:

  sync   = d_sync / (1250 · t_base)
  async  = (n_c · (t_contended − t_base)) / (1250 · t_base),
           n_c = steps overlapped = ceil(d_wall / t_contended)
  every-N = sync / N               (--metric-snap N; exact arithmetic)

usage: python scripts/metric_async_overhead.py [num_gen]
"""

import sys
import threading
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import jax
import jax.numpy as jnp


def main():
    num_gen = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    from gantrack_tpu.metrics.metric_utils import (
        MetricOptions, compute_feature_stats_for_generator,
        make_inception_detector,
    )
    from gantrack_tpu.models.stylegan2 import Discriminator, Generator
    from gantrack_tpu.parallel.mesh import create_mesh, shard_batch
    from gantrack_tpu.training import (
        StyleGAN2Loss, StyleGAN2LossConfig, TrainStepConfig, TrainStepper,
        create_train_state, lazy_reg_adam,
    )
    from gantrack_tpu.training.augment import AugmentPipe, medical_augment_config

    res, batch, zdim = 256, 32, 512
    g = Generator(
        z_dim=zdim, c_dim=0, w_dim=zdim, img_resolution=res, img_channels=1,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=16384, channel_max=512, num_fp16_res=4),
    )
    d = Discriminator(
        c_dim=0, img_resolution=res, img_channels=1,
        channel_base=16384, channel_max=512, num_fp16_res=4,
        epilogue_kwargs=dict(mbstd_group_size=4),
    )
    opt_g = lazy_reg_adam(0.0025, reg_interval=4)
    opt_d = lazy_reg_adam(0.0025, reg_interval=16)
    state = create_train_state(g, d, jax.random.PRNGKey(0), opt_g, opt_d,
                               z_dim=zdim, c_dim=0, img_resolution=res,
                               img_channels=1)
    loss = StyleGAN2Loss(
        g, d, StyleGAN2LossConfig(r1_gamma=0.4096, style_mixing_prob=0.9,
                                  pl_weight=2.0),
        augment_fn=AugmentPipe(medical_augment_config(), res, res, 1))
    cfg = TrainStepConfig(batch_size=batch, z_dim=zdim, ada_target=0.6)
    mesh = create_mesh(1)
    stepper = TrainStepper(loss, opt_g, opt_d, cfg, mesh)
    imgs = shard_batch(mesh, jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, res, res, 1)),
        jnp.float32))
    fn = stepper.get(False, False)

    @jax.jit
    def gen(z, c=None):
        return g.apply({"params": state.params_g_ema, **state.consts_g,
                        "emas": state.emas_g}, z, None, noise_mode="const")

    detector = make_inception_detector(None)
    mopts = MetricOptions(generator=gen, z_dim=zdim, c_dim=0,
                          detector=detector, batch_size=256)

    def metric_pass(n):
        compute_feature_stats_for_generator(mopts, capture_mean_cov=True,
                                            max_items=n)

    # compile both programs out of the timed windows
    state0, _ = fn(state, imgs)
    np.asarray(state0.pl_mean)
    metric_pass(512)

    def window(s, k=16):
        t0 = time.perf_counter()
        for _ in range(k):
            s, _ = fn(s, imgs)
        np.asarray(s.pl_mean)
        return (time.perf_counter() - t0) / k, s

    # baseline
    ts, s = [], state0
    for _ in range(4):
        dt, s = window(s)
        ts.append(dt)
    t_base = float(np.median(ts))

    # metric alone (sync cost)
    t0 = time.perf_counter()
    metric_pass(num_gen)
    d_sync = time.perf_counter() - t0

    # async: metric thread + stepping concurrently
    done = threading.Event()

    def run_metric():
        metric_pass(num_gen)
        done.set()

    th = threading.Thread(target=run_metric, daemon=True)
    t_start = time.perf_counter()
    th.start()
    contended, n_windows = [], 0
    while not done.is_set():
        dt, s = window(s)
        contended.append(dt)
        n_windows += 1
    d_wall = time.perf_counter() - t_start
    th.join()
    t_cont = float(np.median(contended)) if contended else t_base

    interval_steps = 40_000 // batch  # 40 kimg per snapshot at snap=10/tick=4
    base_interval = interval_steps * t_base
    sync_ovh = d_sync / base_interval
    n_c = min(interval_steps, int(np.ceil(d_wall / t_cont)))
    async_ovh = n_c * (t_cont - t_base) / base_interval

    print(f"t_base            {t_base*1e3:8.1f} ms/step")
    print(f"t_contended       {t_cont*1e3:8.1f} ms/step "
          f"({n_windows} windows while metric ran)")
    print(f"metric sync       {d_sync:8.1f} s  -> overhead "
          f"{sync_ovh*100:5.1f}% @snap=10")
    print(f"metric async wall {d_wall:8.1f} s  -> overhead "
          f"{async_ovh*100:5.1f}% @snap=10")
    for n in (2, 3, 5):
        print(f"--metric-snap {n}: sync {sync_ovh/n*100:5.1f}%  "
              f"async {async_ovh/n*100:5.1f}%")


if __name__ == "__main__":
    main()
