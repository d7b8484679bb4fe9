"""End-to-end smoke on the real TPU: BASELINE config 3 equivalent.

Synthetic claro-like 64² dataset → the public train entry (config
assembly → loop → artifacts) for a short run → EMA sampling → FID-1k
with the fallback detector.  Validates the full product path on
hardware; run:  python scripts/smoke_train_tpu.py <workdir>
"""

import json
import os
import sys

import numpy as np


def main(workdir):
    import jax

    from gantrack_tpu.data.preprocess.packaging import pack_shards
    from gantrack_tpu.tools.train import train
    from gantrack_tpu.utils.config import EasyDict

    data_dir = os.path.join(workdir, "data")
    if not os.path.exists(os.path.join(data_dir, "train", "index.json")):
        rng = np.random.default_rng(0)
        # blobby structured images, not pure noise, so FID has signal
        xs, ys = np.meshgrid(np.arange(64), np.arange(64))
        images = []
        for i in range(512):
            cx, cy, r = rng.uniform(12, 52, 3)
            img = 255.0 * np.exp(-(((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * (4 + r) ** 2)))
            img += rng.normal(0, 8, (64, 64))
            images.append(np.clip(img, 0, 255).astype(np.float32)[:, :, None])
        pack_shards(data_dir, "train", images, [f"s{i}" for i in range(512)],
                    dataset_name="smoke")
        print("packed synthetic dataset")

    opts = EasyDict(
        data=data_dir, cond=False, mirror=True, seed=0, num_devices=1,
        batch=32, aug="ada", aug_opts=["xflip", "xint", "scale", "rotate", "aniso", "xfrac"],
        xint_max=0.05, rotate_max=3, xfrac_std=0.05, scale_std=0.05, aniso_std=0.05,
        aug_p=0.2, target=0.6, ada_kimg=100, resume=None, freezed=0,
        cfg="stylegan2", glr=0.0025, dlr=0.0025, metrics_cache=False,
        detector_weights=None, modalities="CT", dataset_name="smoke",
    )
    c = EasyDict(
        cfg="stylegan2", batch_size=32, total_kimg=3, kimg_per_tick=1,
        snapshot_ticks=3, random_seed=0, metrics=["fid1k"],
        G=EasyDict(z_dim=64, w_dim=64, channel_base=2048, channel_max=128,
                   num_fp16_res=4, map_depth=2),
        D=EasyDict(channel_base=2048, channel_max=128, num_fp16_res=4,
                   mbstd_group=4, freezed=0),
        glr=0.0025, dlr=0.0025, gamma=0.4096, ema_kimg=10, aug="ada", target=0.6,
        dataset=data_dir,
    )
    run_dir = os.path.join(workdir, "run")
    os.makedirs(run_dir, exist_ok=True)
    train(c, opts, run_dir, dict(split="train", xflip=True, use_labels=False,
                                 random_seed=0))

    # Verify artifacts.
    for f in ["stats.jsonl", "reals.png", "fakes_init.png"]:
        assert os.path.exists(os.path.join(run_dir, f)), f
    with open(os.path.join(run_dir, "stats.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    print(f"ticks: {len(recs)}; last G_loss={recs[-1].get('Loss/G/loss'):.3f} "
          f"D_loss={recs[-1].get('Loss/D/loss'):.3f} "
          f"augment_p={recs[-1].get('Progress/augment'):.3f}")
    print("SMOKE OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/gantrack_smoke")
