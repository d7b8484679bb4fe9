"""Cross-framework FID-number equality (VERDICT r4 #3).

Feature-level detector parity (test_detector_parity.py) proves the
detector graphs match; this test closes the rest of the FID protocol as a
*number*: the reference's own ``metric_utils`` +
``frechet_inception_distance.compute_fid`` running on CPU torch vs this
repo's ``metrics.fid.compute_fid``, on the same stored dataset, with the
same transplanted G and the same random detector weights on both sides —
covering the per-batch ``images.max() != 255`` → *255 → uint8-truncate
dataset shim (``metric_utils.py:240-247``), the generator
``(img*127.5+128).clamp(0,255).to(uint8)`` truncation (``:291``), the
1→3-channel repeat (``:255-257``), float64 mean/cov accumulation
(``:110-115``), and the scipy sqrtm FID formula
(``frechet_inception_distance.py:20-40``).

The z-streams are made identical by recording the z's our deterministic
pipeline draws and replaying them into the reference's ``torch.randn``
(same concatenated sequence ⇒ same images regardless of chunking:
reference generates in batch_gen=4 chunks, ours in batch-size chunks).
Rank-interleaving (``:117-125``) is order-only and FID's mean/cov are
order-invariant, so num_gpus=1 covers the number.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import has_reference, import_reference_module
from gantrack_tpu.data.dataset import ZipSliceDataset
from gantrack_tpu.data.preprocess.packaging import (
    holdout_split, write_slice_pickles, write_zip,
)

requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference tree not present")

ZDIM = 16
RES = 16
FDIM = 8
MODALITY = "MR_nonrigid_CT"


@pytest.fixture(scope="module")
def unit_range_zip(tmp_path_factory):
    """Reference-format dataset zip storing [0,1) float slices — the
    regime where the reference's *255→uint8 shim is live."""
    tmp = tmp_path_factory.mktemp("xfwds")
    src = tmp / "temp"
    rng = np.random.default_rng(7)
    patients = [f"P{i:03d}" for i in range(4)]
    for p in patients:
        vol = {MODALITY: rng.random((RES, RES, 40)).astype(np.float32) * 0.97}
        write_slice_pickles(str(src), p, vol, pop_range=4)
    split = holdout_split(
        patients, fractions={"train": 0.5, "val": 0.25, "test": 0.25})
    out = str(tmp / "xfw.zip")
    write_zip(str(src), out, split)
    return out


def _shared_detector(torch):
    """One tiny random detector, two frameworks: torch NCHW module and a
    jax NHWC apply with the SAME weights (transplanted)."""
    import torch.nn as tnn
    import torch.nn.functional as F

    class TorchDet(tnn.Module):
        def __init__(self):
            super().__init__()
            g = torch.Generator().manual_seed(11)
            self.c0 = tnn.Conv2d(3, 8, 3, stride=2, padding=1)
            self.c1 = tnn.Conv2d(8, 16, 3, stride=2, padding=1)
            self.fc = tnn.Linear(16, FDIM)
            with torch.no_grad():
                for m in (self.c0, self.c1, self.fc):
                    tnn.init.normal_(m.weight, std=0.2, generator=g)
                    tnn.init.normal_(m.bias, std=0.1, generator=g)

        def forward(self, x, return_features=True):
            assert return_features
            x = x.to(torch.float32) / 64.0 - 2.0
            x = F.relu(self.c0(x))
            x = F.relu(self.c1(x))
            return self.fc(x.mean(dim=(2, 3)))

    tdet = TorchDet().eval()

    def to_hwio(w):  # torch OIHW -> jax HWIO
        return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))

    params = {
        "c0w": to_hwio(tdet.c0.weight), "c0b": jnp.asarray(tdet.c0.bias.detach().numpy()),
        "c1w": to_hwio(tdet.c1.weight), "c1b": jnp.asarray(tdet.c1.bias.detach().numpy()),
        "fcw": jnp.asarray(tdet.fc.weight.detach().numpy().T),
        "fcb": jnp.asarray(tdet.fc.bias.detach().numpy()),
    }

    def apply_fn(p, imgs):  # NHWC float 0..255
        x = imgs / 64.0 - 2.0
        dn = jax.lax.conv_dimension_numbers(x.shape, p["c0w"].shape,
                                            ("NHWC", "HWIO", "NHWC"))
        x = jax.lax.conv_general_dilated(
            x, p["c0w"], (2, 2), [(1, 1), (1, 1)], dimension_numbers=dn)
        x = jax.nn.relu(x + p["c0b"])
        dn = jax.lax.conv_dimension_numbers(x.shape, p["c1w"].shape,
                                            ("NHWC", "HWIO", "NHWC"))
        x = jax.lax.conv_general_dilated(
            x, p["c1w"], (2, 2), [(1, 1), (1, 1)], dimension_numbers=dn)
        x = jax.nn.relu(x + p["c1b"])
        return x.mean(axis=(1, 2)) @ p["fcw"] + p["fcb"]

    return tdet, apply_fn, params


@requires_reference
@pytest.mark.slow
def test_fid_number_matches_reference_pipeline(unit_range_zip):
    torch = pytest.importorskip("torch")
    nets = import_reference_module("training.networks_stylegan2")
    ref_mu = import_reference_module("metrics.metric_utils")
    ref_fid = import_reference_module("metrics.frechet_inception_distance")

    from gantrack_tpu.metrics.fid import compute_fid as our_compute_fid
    from gantrack_tpu.metrics.metric_utils import Detector, MetricOptions
    from gantrack_tpu.models.stylegan2 import Generator
    from gantrack_tpu.models.torch_compat import generator_params_from_torch

    # --- shared G (reference torch weights, transplanted to ours) ------
    torch.manual_seed(3)
    g_ref = nets.Generator(
        z_dim=ZDIM, c_dim=0, w_dim=ZDIM, img_resolution=RES, img_channels=1,
        mapping_kwargs={"num_layers": 2},
        channel_base=128, channel_max=32, num_fp16_res=0,
    ).eval()
    g_ours = Generator(
        z_dim=ZDIM, c_dim=0, w_dim=ZDIM, img_resolution=RES, img_channels=1,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=128, channel_max=32, num_fp16_res=0),
    )
    variables = jax.tree.map(jnp.asarray, generator_params_from_torch(g_ref))

    tdet, apply_fn, det_params = _shared_detector(torch)

    # --- our side ------------------------------------------------------
    max_real, num_gen, batch = 64, 128, 64
    dataset = ZipSliceDataset(unit_range_zip, split="train",
                              modalities=[MODALITY])
    assert len(dataset) >= max_real

    def generator(z, c):
        return g_ours.apply(variables, z, c, noise_mode="const")

    opts = MetricOptions(
        generator=generator, z_dim=ZDIM, c_dim=0, dataset=dataset,
        detector=Detector(apply_fn, det_params, name="xfw-shared"),
        batch_size=batch, cache_dir=None, seed=0,
    )
    ours = our_compute_fid(opts, max_real=max_real, num_gen=num_gen)

    # --- reference side ------------------------------------------------
    # Same z sequence: replay the z's our deterministic pipeline draws
    # (metric_utils.compute_feature_stats_for_generator) into torch.randn.
    base_key = jax.random.PRNGKey(0)
    z_all = np.concatenate([
        np.asarray(jax.random.normal(jax.random.fold_in(base_key, step),
                                     (batch, ZDIM)))
        for step in range(-(-num_gen // batch))
    ])
    consumed = {"n": 0}
    real_randn = torch.randn

    def replay_randn(shape, device=None, **kw):
        n = shape[0] if isinstance(shape, (list, tuple)) else shape
        assert isinstance(shape, (list, tuple)) and shape[1] == ZDIM, shape
        out = torch.from_numpy(z_all[consumed["n"]: consumed["n"] + n].copy())
        assert out.shape[0] == n, "z replay exhausted"
        consumed["n"] += n
        return out

    url = ("https://api.ngc.nvidia.com/v2/models/nvidia/research/stylegan3/"
           "versions/1/files/metrics/inception-2015-12-05.pkl")
    device = torch.device("cpu")
    ref_mu._feature_detector_cache[(url, device)] = tdet

    ref_opts = ref_mu.MetricOptions(
        G=g_ref,
        G_kwargs=dict(noise_mode="const", force_fp32=True),
        dataset_kwargs=dict(
            class_name="training.dataset_mi_multimodal.CustomImageFolderDataset",
            path=unit_range_zip, dtype="float32", split="train",
            use_labels=False, modalities=[MODALITY],
        ),
        num_gpus=1, rank=0, device=device, cache=False, mode_dict=None,
    )
    try:
        torch.randn = replay_randn
        with torch.no_grad():
            theirs = ref_fid.compute_fid(ref_opts, max_real=max_real,
                                         num_gen=num_gen)
    finally:
        torch.randn = real_randn
    assert consumed["n"] == num_gen

    # Residual delta is framework fp noise through G/detector (plus rare
    # floor-boundary flips at the uint8 casts), not protocol drift.
    assert np.isfinite(ours) and np.isfinite(theirs)
    assert ours == pytest.approx(theirs, rel=5e-3, abs=1e-4), (ours, theirs)


@requires_reference
def test_dataset_uint8_shim_matches_reference_branch(unit_range_zip):
    """The per-batch shim itself, bit-for-bit vs the reference loop's
    tensor math (``metric_utils.py:240-247``) on [0,1) float batches and
    on a batch containing an exact 255."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)

    def ours(batch):  # mirror of the metric_utils dataset-pass branches
        got, bmax = batch.copy(), float(batch.max())
        if bmax != 255 and bmax <= 1.001:
            got = np.clip(got * 255, 0, 255).astype(np.uint8).astype(np.float32)
        return got

    def reference(batch):
        images = torch.from_numpy(batch.transpose(0, 3, 1, 2).copy())
        if images.max() != 255:
            temp = []
            for img in images:
                img = img * 255
                img = img.clamp(0, 255).to(torch.uint8)
                temp.append(img.unsqueeze(dim=0))
            images = torch.cat(temp)
        return images.to(torch.float32).numpy().transpose(0, 2, 3, 1)

    # [0,1) floats (shim live) and [0,255] with clipped highlights
    # (passthrough): bit-equal to the reference in both regimes.
    for batch in (rng.random((5, RES, RES, 1)).astype(np.float32),
                  np.clip(rng.random((5, RES, RES, 1)).astype(np.float32)
                          * 300, 0, 255)):
        np.testing.assert_array_equal(ours(batch), reference(batch))

    # DOCUMENTED DIVERGENCE (PARITY.md): [0,255]-floats without an exact
    # 255 — the reference saturates (max pixel -> 255 here), we pass
    # through unchanged and warn.
    batch = (rng.random((5, RES, RES, 1)).astype(np.float32) * 254)
    assert reference(batch).max() == 255.0  # saturated by the reference
    np.testing.assert_array_equal(ours(batch), batch)  # preserved by us
