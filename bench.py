"""Benchmark: StyleGAN2-ADA 256² training throughput on one TPU chip.

Measures the full 4-phase training step (Gmain + PL, Dmain + R1, ADA
augment, G-EMA) at the reference claro recipe (batch 32, cbase 16384,
gamma 0.4096 — BASELINE.md) and prints ONE JSON line:
    {"metric": "imgs_per_sec_per_chip_sg2_256", "value": N,
     "unit": "imgs/sec/chip", "vs_baseline": N / 45.8}
Baseline: 45.8 imgs/sec/GPU (V100, reference configs.md:182).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def _wait_for_backend(max_wait: float = 1500, probe_timeout: float = 150) -> bool:
    """The tunneled axon backend can hang (not fail) jax.device init during
    infra outages; probing in a killable subprocess keeps this process
    healthy.  Retries until ``max_wait`` (GANTRACK_BENCH_MAX_WAIT), then
    gives up so the caller can emit a diagnostic line instead of hanging."""
    max_wait = float(os.environ.get("GANTRACK_BENCH_MAX_WAIT", max_wait))
    deadline = time.time() + max_wait
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False
        print("TPU backend unavailable; retrying...", file=sys.stderr, flush=True)
        time.sleep(min(120, max(1, deadline - time.time())))


def main():
    if not _wait_for_backend():
        print(json.dumps({
            "metric": "imgs_per_sec_per_chip_sg2_256", "value": 0,
            "unit": "imgs/sec/chip", "vs_baseline": 0,
            "detail": {"error": "TPU backend unavailable (init hang/UNAVAILABLE) "
                                "after retry window; not a code regression"},
        }))
        return 1
    import jax

    # Hardware RBG PRNG: threefry costs ~7 ms/step in u32 bit-gen fusions
    # (10+ streams: per-layer noise, style mixing, augment draws).
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from gantrack_tpu.models.stylegan2 import Discriminator, Generator
    from gantrack_tpu.parallel.mesh import create_mesh, shard_batch
    from gantrack_tpu.training import (
        StyleGAN2Loss, StyleGAN2LossConfig, TrainStepConfig, TrainStepper,
        create_train_state, lazy_reg_adam,
    )
    from gantrack_tpu.training.augment import AugmentPipe, medical_augment_config

    res = 256
    batch = 32
    cbase, cmax = 16384, 512
    zdim = 512

    g = Generator(
        z_dim=zdim, c_dim=0, w_dim=zdim, img_resolution=res, img_channels=1,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=cbase, channel_max=cmax, num_fp16_res=4),
    )
    d = Discriminator(
        c_dim=0, img_resolution=res, img_channels=1,
        channel_base=cbase, channel_max=cmax, num_fp16_res=4,
        epilogue_kwargs=dict(mbstd_group_size=4),
    )
    opt_g = lazy_reg_adam(0.0025, reg_interval=4)
    opt_d = lazy_reg_adam(0.0025, reg_interval=16)
    state = create_train_state(
        g, d, jax.random.PRNGKey(0), opt_g, opt_d,
        z_dim=zdim, c_dim=0, img_resolution=res, img_channels=1,
    )
    augment = AugmentPipe(medical_augment_config(), res, res, 1)
    loss = StyleGAN2Loss(
        g, d, StyleGAN2LossConfig(r1_gamma=0.4096, style_mixing_prob=0.9, pl_weight=2.0),
        augment_fn=augment,
    )
    cfg = TrainStepConfig(batch_size=batch, z_dim=zdim, ada_target=0.6)
    mesh = create_mesh(1)
    stepper = TrainStepper(loss, opt_g, opt_d, cfg, mesh)

    rng = np.random.default_rng(0)
    imgs = shard_batch(mesh, jnp.asarray(
        rng.standard_normal((batch, res, res, 1)), jnp.float32
    ))
    zeros_c = jnp.zeros((batch, 0), jnp.float32)

    # Per-variant medians, combined by the lazy-reg cadence (per 16 steps:
    # 12 plain, 3 +Greg, 1 +Greg+Dreg).  Median-of-windows is robust to the
    # environment's periodic multi-second runtime hiccups.  NOTE: on this
    # platform ``block_until_ready`` does not synchronise; a concrete value
    # fetch of the last output drains the in-order execution queue, so each
    # window is timed dispatch→fetch.
    def _drain(s):
        np.asarray(s.pl_mean)  # device->host fetch of a scalar

    def median_step_ms(do_gpl, do_dr1, windows=5, steps_per_window=16):
        # 16-step windows: the drain + first-dispatch latency (~30 ms via
        # the tunneled runtime) amortises as in real training, where the
        # loop runs back-to-back and fetches only at tick boundaries.
        nonlocal state
        fn = stepper.get(do_gpl, do_dr1)
        state, _ = fn(state, imgs, zeros_c)  # compile + first exec
        _drain(state)
        times = []
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(steps_per_window):
                state, _ = fn(state, imgs, zeros_c)
            _drain(state)
            times.append((time.perf_counter() - t0) / steps_per_window)
        return float(np.median(times) * 1000)

    t_ff = median_step_ms(False, False)
    t_tf = median_step_ms(True, False)
    t_tt = median_step_ms(True, True)
    mean_step_ms = (12 * t_ff + 3 * t_tf + 1 * t_tt) / 16

    # ---- loader-fed end-to-end (VERDICT r4 #7): the REAL path --------
    # loader thread → host batch → shard_batch H2D → step, with the
    # training loop's overlap pattern (next batch H2D enqueued while the
    # step runs).  Uses the plain-phase step; gap vs t_ff is the host
    # cost the synthetic bench can't see.
    def loader_fed_ms(windows=5, steps_per_window=16):
        nonlocal state
        import shutil
        import tempfile

        from gantrack_tpu.data.dataset import open_dataset
        from gantrack_tpu.data.loader import InfiniteLoader
        from gantrack_tpu.data.preprocess.packaging import pack_shards

        tmp = tempfile.mkdtemp(prefix="benchds-")
        try:
            imgs_np = [(rng.random((res, res, 1)) * 255).astype(np.float32)
                       for _ in range(256)]
            pack_shards(tmp, "train", imgs_np,
                        [f"s{i}" for i in range(len(imgs_np))])
            dataset = open_dataset(tmp, split="train")
            loader = InfiniteLoader(dataset, batch_size=batch, seed=0,
                                    num_workers=2, prefetch=4)
            fn = stepper.get(False, False)
            nb = shard_batch(mesh, jnp.asarray(next(loader)[0]))
            state, _ = fn(state, nb, zeros_c)
            _drain(state)
            times = []
            for _ in range(windows):
                t0 = time.perf_counter()
                for _ in range(steps_per_window):
                    b = nb
                    state, _ = fn(state, b, zeros_c)
                    nb = shard_batch(mesh, jnp.asarray(next(loader)[0]))
                _drain(state)
                times.append((time.perf_counter() - t0) / steps_per_window)
            loader.close()
            return float(np.median(times) * 1000)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    t_fed = loader_fed_ms()
    fed_mean_ms = mean_step_ms + (t_fed - t_ff)  # reg cadence + host gap

    imgs_per_sec = batch / (mean_step_ms / 1000)
    baseline = 45.8  # imgs/sec/GPU, V100, reference configs.md:182
    print(json.dumps({
        "metric": "imgs_per_sec_per_chip_sg2_256",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(imgs_per_sec / baseline, 3),
        "detail": {
            "step_ms_plain": round(t_ff, 1),
            "step_ms_greg": round(t_tf, 1),
            "step_ms_greg_dreg": round(t_tt, 1),
            "sec_per_kimg": round(mean_step_ms / batch, 2),
            "step_ms_loader_fed": round(t_fed, 1),
            "host_gap_ms": round(t_fed - t_ff, 1),
            "imgs_per_sec_loader_fed": round(batch / (fed_mean_ms / 1000), 2),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
