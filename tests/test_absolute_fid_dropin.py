"""The absolute-FID drop-in path, end to end through the CLI.

The reference computes FID with the TF-slim inception-2015-12-05 network
(``metrics/frechet_inception_distance.py:22``); the weight file cannot be
fetched in this zero-egress environment.  These tests prove that the day a
``pt_inception-2015-12-05*.pth`` file lands, the ONE documented command

    python -m gantrack_tpu.tools.convert_detector \
        --src pt_inception-2015-12-05-6726825d.pth \
        --dst inception_tfslim.npz --arch inception-tfslim

followed by ``calc_metrics --detector-weights inception_tfslim.npz``
produces absolute FID: a fabricated weights file with the real file's
exact key naming and shapes flows through the click CLI, the npz loader,
``make_inception_detector``, and a full ``calc_metric('fid1k')`` run.
"""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from click.testing import CliRunner

from gantrack_tpu.metrics import MetricOptions
from gantrack_tpu.metrics.fid import compute_fid
from gantrack_tpu.metrics.metric_utils import make_inception_detector
from gantrack_tpu.tools import convert_detector

from test_detector_parity import TorchInceptionTFSlim, _randomize_bn_stats
from test_metrics import SyntheticDataset

pytestmark = pytest.mark.slow  # full-size InceptionV3 forward on CPU


@pytest.fixture(scope="module")
def tfslim_npz(tmp_path_factory):
    """Fabricate a pt_inception-2015-12-05-style checkpoint (pytorch-fid's
    key naming — the state dict of its FIDInceptionV3 wrapper) and convert
    it through the real CLI."""
    tmp = tmp_path_factory.mktemp("dropin")
    tm = TorchInceptionTFSlim().eval()
    _randomize_bn_stats(tm, seed=7)
    src = tmp / "pt_inception-2015-12-05-test.pth"
    torch.save(tm.state_dict(), str(src))

    dst = tmp / "inception_tfslim.npz"
    result = CliRunner().invoke(
        convert_detector.main,
        ["--src", str(src), "--dst", str(dst), "--arch", "inception-tfslim"],
    )
    assert result.exit_code == 0, result.output
    return str(dst)


def test_cli_conversion_and_detector_load(tfslim_npz):
    det = make_inception_detector(tfslim_npz)
    assert det.name.startswith("inception-tfslim"), (
        "npz must carry the tfslim variant tag so the loader builds the "
        "FID-protocol graph, not the torchvision one")
    imgs = (np.random.default_rng(0).random((2, 32, 32, 3)) * 255).astype(np.float32)
    feats = det(imgs)
    assert feats.shape == (2, 2048)
    assert np.all(np.isfinite(feats))


def test_absolute_fid_pipeline_end_to_end(tfslim_npz):
    """fid1k through the converted detector: dataset-vs-itself ≈ 0 (the
    absolute-FID contract), generator-vs-dataset finite and larger."""
    det = make_inception_detector(tfslim_npz)
    ds = SyntheticDataset(n=8, res=32)

    def generator(z, c):
        key = jax.random.PRNGKey(0)
        return jax.random.uniform(key, (z.shape[0], 32, 32, 1)) * 2 - 1

    opts = MetricOptions(
        generator=generator, z_dim=8, c_dim=0, dataset=ds,
        detector=det, batch_size=4, seed=0,
    )
    fid = compute_fid(opts, max_real=8, num_gen=8)
    assert np.isfinite(fid) and fid > 0

    # Same feature stats on both sides -> FID 0 (protocol sanity, same
    # mean/cov/sqrtm arithmetic as compute_fid).
    import scipy.linalg

    from gantrack_tpu.metrics.feature_stats import FeatureStats
    feats = det(ds._data.repeat(3, axis=-1))
    s = FeatureStats(capture_mean_cov=True)
    s.append(np.asarray(feats, np.float64))
    mu, cov = s.get_mean_cov()
    sq, _ = scipy.linalg.sqrtm(np.dot(cov, cov), disp=False)
    self_fid = np.real(np.trace(cov + cov - sq * 2))
    assert abs(self_fid) < 1e-4


def test_torchscript_and_pickled_module_containers(tmp_path):
    """`load_state_dict` reads the other two container formats the real
    file may arrive in: a pickled nn.Module and a TorchScript archive."""
    m = torch.nn.Sequential(torch.nn.Linear(4, 3))

    p1 = tmp_path / "module.pkl"
    torch.save(m, str(p1))
    sd1 = convert_detector.load_state_dict(str(p1))
    assert "0.weight" in sd1

    p2 = tmp_path / "scripted.pt"
    torch.jit.save(torch.jit.script(m), str(p2))
    sd2 = convert_detector.load_state_dict(str(p2))
    assert any(k.endswith("weight") for k in sd2)


def test_wrapper_prefix_stripping(tmp_path):
    sd = {"module.fc.weight": torch.zeros(2, 2), "module.fc.bias": torch.zeros(2)}
    p = tmp_path / "wrapped.pth"
    torch.save(sd, str(p))
    out = convert_detector.load_state_dict(str(p))
    assert set(out) == {"fc.weight", "fc.bias"}
