"""Synthetic claro-shaped dataset for long-horizon training evidence.

The real claro lung-CT slices are not distributable in this image; this
builds a structured stand-in with comparable statistics for the 500-kimg
trajectory run (VERDICT r4 #3): 256² single-channel f32 in [0,255],
body-like ellipse + two lung-like low-intensity cavities with vascular
texture + acquisition noise, per-patient correlated geometry (32 slices
per synthetic patient).

usage: python scripts/make_claro_shaped.py [out_dir] [n_imgs] [res]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/claro_shaped"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
RES = int(sys.argv[3]) if len(sys.argv) > 3 else 256


def make_patient(rng, depth=32):
    yy, xx = np.mgrid[0:RES, 0:RES].astype(np.float32) / RES - 0.5
    # patient-level anatomy parameters
    body_a = rng.uniform(0.38, 0.46)
    body_b = rng.uniform(0.30, 0.38)
    lung_dx = rng.uniform(0.13, 0.18)
    lung_a = rng.uniform(0.09, 0.13)
    lung_b = rng.uniform(0.14, 0.20)
    tex_seed = rng.integers(1 << 31)
    out = []
    for s in range(depth):
        t = s / depth
        # slice-wise size modulation (lungs grow then shrink through z)
        g = np.sin(np.pi * np.clip(t * 1.2, 0, 1)) * 0.9 + 0.1
        body = ((xx / body_a) ** 2 + (yy / body_b) ** 2) < 1.0
        img = np.full((RES, RES), 30.0, np.float32)      # air ~30
        img[body] = 170.0                                # soft tissue
        for sx in (-1, 1):
            lung = (((xx - sx * lung_dx) / (lung_a * g + 1e-3)) ** 2
                    + (yy / (lung_b * g + 1e-3)) ** 2) < 1.0
            img[lung & body] = 55.0                       # aerated lung
        # vascular/parenchymal texture: band-passed patient-seeded noise
        trng = np.random.default_rng(tex_seed + s)
        tex = trng.normal(0, 1, (RES // 4, RES // 4)).astype(np.float32)
        tex = np.kron(tex, np.ones((4, 4), np.float32))
        img = img + tex * 12.0 * body
        # spine-ish bright blob — clipped highlight: real claro
        # normalization pins per-volume maxima at exactly 255
        # (dataset_tool_mi.py:313-331), so every slice carries exact-255
        # pixels and the reference's per-batch uint8 metric shim
        # (metric_utils.py:240-247) stays a passthrough.
        spine = ((xx / 0.05) ** 2 + ((yy - 0.28) / 0.06) ** 2) < 1.0
        img[spine & body] = 280.0
        img = img + trng.normal(0, 4.0, (RES, RES)).astype(np.float32)
        out.append(np.clip(img, 0, 255)[:, :, None].astype(np.float32))
    return out


def main():
    from gantrack_tpu.data.preprocess.packaging import pack_shards

    rng = np.random.default_rng(0)
    imgs, names = [], []
    pid = 0
    while len(imgs) < N:
        sl = make_patient(rng)
        for i, im in enumerate(sl):
            imgs.append(im)
            names.append(f"P{pid:04d}_{i:03d}")
        pid += 1
    imgs, names = imgs[:N], names[:N]
    path = pack_shards(OUT, "train", imgs, names, dataset_name="claro_shaped")
    print(f"wrote {len(imgs)} imgs → {path}")


if __name__ == "__main__":
    main()
