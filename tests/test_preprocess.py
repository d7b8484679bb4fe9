"""Preprocessing parity: get_box/normalize/load_slice vs the reference
claro functions (BASELINE config 1 requires bit-exactness), split
determinism, NIfTI roundtrip, mask/resample sanity."""

import numpy as np
import pytest

from gantrack_tpu.data.preprocess.medical import (
    body_mask_slice,
    clip_and_rescale_volume,
    get_box,
    load_slice,
    normalize,
    resample_volume,
)
from gantrack_tpu.data.preprocess.nifti import read_nifti, write_nifti
from gantrack_tpu.data.preprocess.packaging import holdout_split
from conftest import has_reference, import_reference_module

requires_reference = pytest.mark.skipif(not has_reference(), reason="reference tree not present")


@requires_reference
@pytest.mark.parametrize("box", [
    [10, 20, 50, 40],   # taller than wide
    [20, 10, 40, 50],   # wider than tall
    [10, 10, 40, 40],   # square
    [0, 2, 30, 60],     # clipped at top edge
    [30, 40, 62, 62],   # clipped at bottom/right
])
@pytest.mark.parametrize("perc_border", [0.0, 0.5])
def test_get_box_bit_exact(box, perc_border):
    umd = import_reference_module("genlib.utils.util_medical_data")
    rng = np.random.default_rng(0)
    img = rng.random((64, 64))
    want = umd.get_box(img.copy(), list(box), perc_border=perc_border)
    got = get_box(img.copy(), list(box), perc_border=perc_border)
    assert want.shape == got.shape
    np.testing.assert_array_equal(want, got)


@requires_reference
def test_normalize_bit_exact():
    umd = import_reference_module("genlib.utils.util_medical_data")
    rng = np.random.default_rng(1)
    img = rng.random((32, 32)) * 2000 - 1000
    for kwargs in [
        dict(convert_to_uint8=False, scale_by_255=True),
        dict(convert_to_uint8=True, scale_by_255=True),
        dict(convert_to_uint8=False, scale_by_255=True, min_val=-1000, max_val=1000),
        dict(convert_to_uint8=False, scale_by_255=False),
    ]:
        want = umd.normalize(img.copy(), **kwargs)
        got = normalize(img.copy(), **kwargs)
        np.testing.assert_array_equal(want, got)


@requires_reference
def test_load_slice_pipeline_bit_exact():
    """Full claro per-slice pipeline: crop → cv2.resize → clip → normalize."""
    umd = import_reference_module("genlib.utils.util_medical_data")
    import cv2

    rng = np.random.default_rng(2)
    img = (rng.random((96, 80)) * 2000 - 1000).astype(np.float64)
    box = [10, 8, 70, 60]
    # reference loader() reads from disk; replicate its body on the array
    ref = umd.get_box(img.copy(), list(box), perc_border=0.5)
    ref = cv2.resize(ref, (64, 64))
    ref = np.clip(ref, -1000, 1000)
    ref = umd.normalize(ref, False, True, min_val=-1000, max_val=1000)

    got = load_slice(
        img.copy(), img_dim=64, box=list(box),
        clip={"min": -1000, "max": 1000}, scale={"min": -1000, "max": 1000},
        convert_to_uint8=False, scale_by_255=True,
    )
    np.testing.assert_array_equal(ref, got)


def test_clip_and_rescale_volume():
    vol = np.linspace(-2000, 2000, 64).reshape(4, 4, 4)
    out = clip_and_rescale_volume(vol, -1000, 1000)
    assert out.min() == 0.0 and out.max() == 255.0
    out01 = clip_and_rescale_volume(vol, percentiles=(1, 99), to_255=False)
    assert 0 <= out01.min() and out01.max() <= 1


def test_body_mask():
    sl = np.zeros((32, 32))
    sl[8:24, 8:24] = 100.0
    sl[14:18, 14:18] = 0.0  # hole to fill
    sl[2, 2] = 100.0  # small CC to drop
    mask = body_mask_slice(sl, threshold=50.0)
    assert mask[16, 16] == 1  # hole filled
    assert mask[2, 2] == 0    # small CC removed
    assert mask[0, 0] == 0


def test_resample_volume():
    vol = np.random.default_rng(3).random((32, 32, 5)).astype(np.float32)
    out, zooms = resample_volume(vol, zooms=(1.0, 1.0, 3.0), zoom_level=2.0)
    assert out.shape == (16, 16, 5)
    assert zooms == (2.0, 2.0, 3.0)


def test_holdout_split_deterministic():
    patients = [f"P{i}" for i in range(20)]
    s1 = holdout_split(list(patients))
    s2 = holdout_split(list(reversed(patients)))  # order-insensitive (sorted first)
    assert s1 == s2
    assert len(s1["train"]) + len(s1["val"]) + len(s1["test"]) == 20
    assert set(s1["train"]) & set(s1["test"]) == set()


def test_nifti_roundtrip(tmp_path):
    vol = np.random.default_rng(4).random((6, 7, 8)).astype(np.float32)
    for name in ["v.nii", "v.nii.gz"]:
        p = str(tmp_path / name)
        write_nifti(p, vol, zooms=(0.5, 0.5, 3.0))
        back, zooms = read_nifti(p)
        np.testing.assert_array_equal(vol, back)
        np.testing.assert_allclose(zooms, (0.5, 0.5, 3.0), rtol=1e-6)


def test_nifti_int_dtype_roundtrip(tmp_path):
    vol = (np.random.default_rng(5).integers(-1000, 1000, (4, 5, 6))).astype(np.int16)
    p = str(tmp_path / "i.nii.gz")
    write_nifti(p, vol)
    back, _ = read_nifti(p)
    np.testing.assert_array_equal(vol, back)


# ----------------------------------------------- golden pins (VERDICT §8)
# SimpleITK / nilearn / dicom2nifti are absent in this environment; the
# scipy stand-ins are pinned with golden values so behaviour can't drift
# silently, and a direct comparison runs automatically if the reference
# deps ever become available.


def test_resample_volume_golden():
    vol = np.stack([
        np.outer(np.sin(np.linspace(0, 3, 64)), np.cos(np.linspace(0, 2, 64)))
    ] * 3, axis=2).astype(np.float32)
    out, zooms = resample_volume(vol, zooms=(0.9766, 0.9766, 3.0), zoom_level=2.0)
    assert out.shape == (32, 32, 3)
    np.testing.assert_allclose(zooms, (1.9532, 1.9532, 3.0), rtol=1e-6)
    # Golden pin: linear-interp scipy.ndimage.zoom output.
    np.testing.assert_allclose(float(out.mean()), 0.28946677, rtol=1e-5)
    np.testing.assert_allclose(float(out[10, 10, 1]), 0.65782851, rtol=1e-4)
    np.testing.assert_allclose(float(out[25, 7, 0]), 0.59463125, rtol=1e-4)


def test_body_mask_golden():
    rng = np.random.default_rng(11)
    sl = rng.normal(20, 5, (64, 64))
    yy, xx = np.mgrid[0:64, 0:64]
    body = ((yy - 32) ** 2 + (xx - 30) ** 2) < 24**2
    sl[body] += 200
    mask = body_mask_slice(sl)  # Otsu path
    np.testing.assert_allclose(int(mask.sum()), 1789, atol=6)
    assert mask[32, 30] == 1 and mask[0, 0] == 0


def test_resample_matches_simpleitk_if_available():
    sitk = pytest.importorskip("SimpleITK")
    vol = np.random.default_rng(0).random((64, 64, 4)).astype(np.float32)
    out, _ = resample_volume(vol, zooms=(1.0, 1.0, 3.0), zoom_level=2.0)
    img = sitk.GetImageFromArray(np.transpose(vol, (2, 0, 1)))
    img.SetSpacing((1.0, 1.0, 3.0))
    res = sitk.Resample(
        img, [32, 32, 4], sitk.Transform(), sitk.sitkLinear, img.GetOrigin(),
        (2.0, 2.0, 3.0), img.GetDirection(), 0.0, img.GetPixelID())
    want = np.transpose(sitk.GetArrayFromImage(res), (1, 2, 0))
    delta = np.abs(out - want).max()
    assert delta < 0.1, f"scipy respacing delta vs SimpleITK: {delta}"


# ---------------------------------------------------------------- EPI mask


def _epi_phantom(seed=0):
    """Body-like phantom: bright ellipsoid on dim noisy background with a
    dark internal cavity (tests threshold, largest-CC and fill-holes)."""
    rng = np.random.default_rng(seed)
    h = w = 48
    d = 12
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    vol = rng.uniform(0, 30, (h, w, d))
    for k in range(d):
        body = ((ys - 24) ** 2 / 18 ** 2 + (xs - 24) ** 2 / 14 ** 2) <= 1.0
        cavity = ((ys - 24) ** 2 + (xs - 28) ** 2) <= 9
        sl = vol[:, :, k]
        sl[body] = 200 + rng.uniform(0, 20, body.sum())
        sl[cavity] = 5.0
        # distractor blob far from the body (must be removed by largest-CC)
        sl[2:5, 40:44] = 180.0
    return vol


def test_compute_epi_mask_matches_independent_algorithm():
    """The production function against an in-test transcription of
    nilearn's published algorithm (masking.compute_epi_mask: FWHM-1
    presmooth, sorted-histogram gap threshold, erosion/largest-CC/
    dilation posting) written with independent numpy code."""
    from scipy import ndimage

    from gantrack_tpu.data.preprocess.medical import compute_epi_mask

    vol = _epi_phantom()
    got = compute_epi_mask(vol)

    # Independent re-derivation.
    arr = vol.astype(np.float64).copy()
    sigma = 1.0 / np.sqrt(8 * np.log(2))
    smoothed = ndimage.gaussian_filter(arr, sigma=(sigma, sigma, sigma))
    sv = np.sort(smoothed.ravel())
    lo, hi = int(np.floor(0.2 * sv.size)), min(int(np.floor(0.85 * sv.size)), sv.size - 1)
    gaps = sv[lo + 1 : hi + 1] - sv[lo:hi]
    ia = int(np.argmax(gaps))
    thr = 0.5 * (sv[ia + lo] + sv[ia + lo + 1])
    m = smoothed >= thr
    m = ndimage.binary_erosion(m, iterations=2)
    lab, n = ndimage.label(m)
    if n > 1:
        counts = np.bincount(lab.ravel()); counts[0] = 0
        m = lab == counts.argmax()
    m = ndimage.binary_dilation(m, iterations=4)
    m = ndimage.binary_erosion(m, iterations=2)

    np.testing.assert_array_equal(got, m.astype(np.uint8))
    # Geometry: body kept, distractor & background dropped.
    assert got[24, 24, 6] == 1
    assert got[3, 42, 6] == 0
    assert got[0, 0, 6] == 0


def test_epi_body_mask_volume_fills_cavity():
    from gantrack_tpu.data.preprocess.medical import (
        compute_epi_mask, epi_body_mask_volume,
    )

    vol = _epi_phantom()
    raw = compute_epi_mask(vol)
    filled = epi_body_mask_volume(vol)
    # The dark cavity inside the body survives fill-holes only.
    assert raw[24, 28, 6] == 0
    assert filled[24, 28, 6] == 1
    assert filled.dtype == np.uint8
    assert (filled >= raw).all()


def test_compute_epi_mask_matches_nilearn_bit_exact():
    """Bit-exact against real nilearn when it is installed (skipped in the
    offline image; the algorithms call the same scipy primitives)."""
    nilearn = pytest.importorskip("nilearn")
    import nibabel as nib
    from nilearn.masking import compute_epi_mask as nl_epi

    from gantrack_tpu.data.preprocess.medical import compute_epi_mask

    vol = _epi_phantom(seed=3)
    img = nib.Nifti1Image(vol, affine=np.eye(4))
    want = np.asarray(nl_epi(img).get_fdata()).astype(np.uint8)
    got = compute_epi_mask(vol)
    np.testing.assert_array_equal(got, want)
