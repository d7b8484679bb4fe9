"""Measure the fid50k_full snapshot overhead against the training protocol.

Reference protocol (BASELINE.md / configs.md:29-31): fid50k_full runs at
every snapshot — Gan-track cadence ``--snap=10 --tick=4`` = every 40 kimg
— and its wall-clock must be <=5% of training time.  This script measures
the generator-side feature extraction (the part that repeats per
snapshot; real-data stats are md5-cached after the first run,
metric_utils.py) on the flagship SG2 256^2 claro config with the standard
random-projection fallback detector, then reports overhead vs measured
training throughput.

usage: python scripts/metric_overhead.py [num_gen] [s_per_kimg] [batch]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import jax


def main():
    num_gen = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    s_per_kimg = float(sys.argv[2]) if len(sys.argv) > 2 else 6.58  # BENCH_r02
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    import jax.numpy as jnp

    from gantrack_tpu.metrics.metric_utils import (
        MetricOptions, compute_feature_stats_for_generator,
        make_inception_detector,
    )
    from gantrack_tpu.models.stylegan2 import Generator

    res, zdim = 256, 512
    g = Generator(
        z_dim=zdim, c_dim=0, w_dim=zdim, img_resolution=res, img_channels=1,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=16384, channel_max=512, num_fp16_res=4),
    )
    z = jnp.zeros((2, zdim), jnp.float32)
    variables = g.init({"params": jax.random.PRNGKey(0),
                        "noise": jax.random.PRNGKey(1)}, z, None)

    @jax.jit
    def gen(z, c=None):
        return g.apply(variables, z, None, truncation_psi=1.0, noise_mode="const")

    detector = make_inception_detector(None)
    opts = MetricOptions(generator=gen, z_dim=zdim, c_dim=0,
                        detector=detector, batch_size=batch)

    # Warm-up: compile G+detector pipeline out of the timed window.
    t0 = time.time()
    compute_feature_stats_for_generator(opts, capture_mean_cov=True,
                                        max_items=256)
    t_compile = time.time() - t0
    print(f"compile+warmup: {t_compile:.1f}s")

    t0 = time.time()
    stats = compute_feature_stats_for_generator(opts, capture_mean_cov=True,
                                                max_items=num_gen)
    t_extract = time.time() - t0
    mu, sigma = stats.get_mean_cov()
    assert np.isfinite(mu).all()

    imgs_per_s = num_gen / t_extract
    t_train_40kimg = 40.0 * s_per_kimg
    overhead = t_extract / t_train_40kimg * 100.0
    print(f"gen-side extraction: {num_gen} imgs in {t_extract:.1f}s "
          f"({imgs_per_s:.0f} imgs/s)")
    print(f"training per 40-kimg snapshot interval @ {s_per_kimg} s/kimg: "
          f"{t_train_40kimg:.0f}s")
    print(f"fid50k_full snapshot overhead: {overhead:.1f}% "
          f"(protocol requires <=5%)")


if __name__ == "__main__":
    main()
