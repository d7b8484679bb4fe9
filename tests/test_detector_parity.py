"""Feature-level detector parity: our flax InceptionV3/VGG16 graphs against
torch mirrors with torchvision state-dict naming, weights transplanted via
``tools/convert_detector.py``.

The reference computes FID from NVIDIA's TorchScript InceptionV3
(``metrics/frechet_inception_distance.py:22``) — unavailable offline.  These
tests prove the conversion map and the architecture: with any real
torchvision-format ``inception_v3``/``vgg16`` checkpoint the converted
detector produces the same features, so the only missing input for absolute
FID parity is the weight file itself.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from gantrack_tpu.models.inception import InceptionV3Features
from gantrack_tpu.models.vgg import VGG16
from gantrack_tpu.tools.convert_detector import (
    convert_inception_state_dict, convert_vgg_state_dict,
)


# ------------------------- torch mirror (torchvision inception_v3 naming)


class BasicConv2d(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class InceptionA(tnn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b5, bd, bp], 1)


class InceptionB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class InceptionC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(
            self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b7, bd, bp], 1)


class InceptionD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(
            self.branch7x7x3_2(self.branch7x7x3_1(x))))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class InceptionE(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b3, bd, bp], 1)


class TorchInceptionV3(tnn.Module):
    """FID feature trunk with torchvision ``inception_v3`` state-dict keys."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = InceptionA(192, 32)
        self.Mixed_5c = InceptionA(256, 64)
        self.Mixed_5d = InceptionA(288, 64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = InceptionC(768, 128)
        self.Mixed_6c = InceptionC(768, 160)
        self.Mixed_6d = InceptionC(768, 160)
        self.Mixed_6e = InceptionC(768, 192)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = InceptionE(1280)
        self.Mixed_7c = InceptionE(2048)

    def forward(self, x255):  # [N, 3, 299, 299] in 0..255
        x = x255 / 127.5 - 1.0
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for blk in ["Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                    "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
                    "Mixed_7c"]:
            x = getattr(self, blk)(x)
        return x.mean(dim=(2, 3))  # [N, 2048]


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                m.weight.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            elif isinstance(m, tnn.Conv2d):
                tnn.init.normal_(m.weight, std=0.05, generator=g)


def _unflatten(flat):
    import flax

    return {"params": flax.traverse_util.unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()})}


# --------------------- torch mirror of the TF-slim 2015-12-05 FID graph
# (what NVIDIA's TorchScript detector actually computes — pool patches per
# pytorch-fid's FIDInception*, (x−128)/128 preprocessing, TF1 legacy
# bilinear resize; reference frechet_inception_distance.py:22)


def _tf1_resize_torch(x, out_h, out_w):
    """TF1 ResizeBilinear (align_corners=False, half_pixel_centers=False)
    on NCHW tensors — independent torch implementation for the mirror."""
    n, c, h, w = x.shape
    if (h, w) == (out_h, out_w):
        return x

    def grid(n_in, n_out):
        src = torch.arange(n_out, dtype=torch.float64) * (n_in / n_out)
        lo = torch.floor(src).long()
        hi = torch.clamp(lo + 1, max=n_in - 1)
        frac = (src - lo.double()).float()
        return lo, hi, frac

    y0, y1, fy = grid(h, out_h)
    x = x[:, :, y0, :] * (1 - fy)[None, None, :, None] \
        + x[:, :, y1, :] * fy[None, None, :, None]
    x0, x1, fx = grid(w, out_w)
    return x[:, :, :, x0] * (1 - fx) + x[:, :, :, x1] * fx


class FIDInceptionA(InceptionA):
    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(
            F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False))
        return torch.cat([b1, b5, bd, bp], 1)


class FIDInceptionC(InceptionC):
    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(
            self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(
            F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False))
        return torch.cat([b1, b7, bd, bp], 1)


class FIDInceptionE1(InceptionE):
    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(
            F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False))
        return torch.cat([b1, b3, bd, bp], 1)


class FIDInceptionE2(InceptionE):
    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        # The 2015-12-05 graph's Mixed_7c pool branch is a MAX pool.
        bp = self.branch_pool(F.max_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b3, bd, bp], 1)


class TorchInceptionTFSlim(tnn.Module):
    """Mirror of the NVIDIA/TF-slim FID network with torchvision/pytorch-fid
    state-dict keys (plus ``fc`` = the 1008-way head)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = FIDInceptionA(192, 32)
        self.Mixed_5c = FIDInceptionA(256, 64)
        self.Mixed_5d = FIDInceptionA(288, 64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = FIDInceptionC(768, 128)
        self.Mixed_6c = FIDInceptionC(768, 160)
        self.Mixed_6d = FIDInceptionC(768, 160)
        self.Mixed_6e = FIDInceptionC(768, 192)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = FIDInceptionE1(1280)
        self.Mixed_7c = FIDInceptionE2(2048)
        self.fc = tnn.Linear(2048, 1008)

    def forward(self, x255, return_logits=False):  # NCHW in 0..255
        x = _tf1_resize_torch(x255, 299, 299)
        x = (x - 128.0) / 128.0
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for blk in ["Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                    "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
                    "Mixed_7c"]:
            x = getattr(self, blk)(x)
        feats = x.mean(dim=(2, 3))
        return self.fc(feats) if return_logits else feats


@pytest.mark.slow
def test_inception_tfslim_feature_parity():
    """Our variant='tfslim' graph == the NVIDIA/TF-slim-graph torch mirror
    after weight transplant — including the TF1 legacy resize path (64² and
    384² inputs: upscale and the aliased downscale) and the 1008 logits."""
    tm = TorchInceptionTFSlim().eval()
    _randomize_bn_stats(tm, seed=3)
    g = torch.Generator().manual_seed(4)
    with torch.no_grad():
        tnn.init.normal_(tm.fc.weight, std=0.01, generator=g)
        tnn.init.normal_(tm.fc.bias, std=0.01, generator=g)
    flat = convert_inception_state_dict(tm.state_dict(), variant="tfslim")
    assert str(flat.pop("__variant__")) == "tfslim"
    variables = _unflatten(flat)

    from gantrack_tpu.models.inception import tf1_resize_bilinear

    rng = np.random.default_rng(2)
    for size in (64, 384):
        x = rng.uniform(0, 255, (2, size, size, 3)).astype(np.float32)
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        # resize primitive parity first (isolates the classic FID trap)
        want_r = _tf1_resize_torch(xt, 299, 299).numpy()
        got_r = np.asarray(tf1_resize_bilinear(jnp.asarray(x), 299, 299))
        np.testing.assert_allclose(
            got_r, want_r.transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-3)

        with torch.no_grad():
            want = tm(xt).numpy()
            want_logits = tm(xt, return_logits=True).numpy()
        model = InceptionV3Features(variant="tfslim")
        got = np.asarray(model.apply(variables, jnp.asarray(x)))
        assert got.shape == (2, 2048)
        scale = np.abs(want).mean() + 1e-6
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3 * scale)

        logits_model = InceptionV3Features(variant="tfslim", return_logits=True)
        got_logits = np.asarray(logits_model.apply(variables, jnp.asarray(x)))
        assert got_logits.shape == (2, 1008)
        lscale = np.abs(want_logits).mean() + 1e-6
        np.testing.assert_allclose(got_logits, want_logits,
                                   rtol=2e-3, atol=2e-3 * lscale)


@pytest.mark.slow
def test_inception_feature_parity():
    tm = TorchInceptionV3().eval()
    _randomize_bn_stats(tm, seed=0)
    flat = convert_inception_state_dict(tm.state_dict())
    flat.pop("__variant__", None)
    variables = _unflatten(flat)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 255, (2, 299, 299, 3)).astype(np.float32)  # no resize path
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    model = InceptionV3Features()
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert got.shape == (2, 2048)
    scale = np.abs(want).mean() + 1e-6
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3 * scale)


@pytest.mark.slow
def test_vgg_feature_parity():
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]

    class TorchVGG(tnn.Module):
        def __init__(self):
            super().__init__()
            layers, cin = [], 3
            for v in cfg:
                if v == "M":
                    layers.append(tnn.MaxPool2d(2, 2))
                else:
                    layers += [tnn.Conv2d(cin, v, 3, padding=1), tnn.ReLU()]
                    cin = v
            self.features = tnn.Sequential(*layers)
            self.classifier = tnn.Sequential(
                tnn.Linear(512 * 7 * 7, 4096), tnn.ReLU(),
                tnn.Dropout(), tnn.Linear(4096, 4096), tnn.ReLU(),
            )

        def forward(self, x255):
            mean = torch.tensor([123.68, 116.779, 103.939]).view(1, 3, 1, 1)
            x = x255 - mean
            x = self.features(x)
            x = torch.flatten(x, 1)
            return self.classifier(x)

    tm = TorchVGG().eval()
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (tnn.Conv2d, tnn.Linear)):
                tnn.init.normal_(m.weight, std=0.03, generator=g)
                tnn.init.normal_(m.bias, std=0.01, generator=g)
    flat = convert_vgg_state_dict(tm.state_dict())
    variables = _unflatten(flat)

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 255, (2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    model = VGG16(resize_to=224)
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert got.shape == (2, 4096)
    scale = np.abs(want).mean() + 1e-6
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3 * scale)
