"""Native DICOM reader: synthetic explicit/implicit-VR little-endian series
round-trip through the dataset_tool DICOM step."""

import os
import struct

import numpy as np
import pytest

from gantrack_tpu.data.preprocess.dicom import (
    read_dicom_file, read_dicom_series,
)


def _el_explicit(group, elem, vr, value: bytes) -> bytes:
    head = struct.pack("<HH", group, elem) + vr
    if vr in (b"OB", b"OW", b"OF", b"SQ", b"UT", b"UN"):
        return head + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return head + struct.pack("<H", len(value)) + value


def _el_implicit(group, elem, value: bytes) -> bytes:
    return struct.pack("<HH", group, elem) + struct.pack("<I", len(value)) + value


def _pad(s: str) -> bytes:
    b = s.encode()
    return b + b" " if len(b) % 2 else b


def _write_dicom(path, px: np.ndarray, z: float, instance: int,
                 explicit: bool, slope=2.0, inter=-1024.0):
    ts = "1.2.840.10008.1.2.1" if explicit else "1.2.840.10008.1.2"
    meta = _el_explicit(0x0002, 0x0010, b"UI", _pad(ts))
    rows, cols = px.shape
    el = _el_explicit if explicit else (lambda g, e, vr, v: _el_implicit(g, e, v))
    body = b"".join([
        el(0x0018, 0x0050, b"DS", _pad("3.0")),
        el(0x0020, 0x0013, b"IS", _pad(str(instance))),
        el(0x0020, 0x0032, b"DS", _pad(f"0\\0\\{z}")),
        el(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
        el(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
        el(0x0028, 0x0030, b"DS", _pad("0.9766\\0.9766")),
        el(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        el(0x0028, 0x0103, b"US", struct.pack("<H", 1)),
        el(0x0028, 0x1052, b"DS", _pad(str(inter))),
        el(0x0028, 0x1053, b"DS", _pad(str(slope))),
        el(0x7FE0, 0x0010, b"OW", px.astype("<i2").tobytes()),
    ])
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)


@pytest.mark.parametrize("explicit", [True, False])
def test_read_single_file(tmp_path, explicit):
    rng = np.random.default_rng(0)
    px = rng.integers(-1000, 2000, (16, 12)).astype(np.int16)
    p = str(tmp_path / "s1.dcm")
    _write_dicom(p, px, z=12.5, instance=3, explicit=explicit)
    d = read_dicom_file(p)
    np.testing.assert_allclose(d["pixels"], px.astype(np.float32) * 2.0 - 1024.0)
    assert d["position_z"] == 12.5
    assert d["instance"] == 3
    np.testing.assert_allclose(d["pixel_spacing"], [0.9766, 0.9766])


def test_series_sorted_and_spaced(tmp_path):
    rng = np.random.default_rng(1)
    slices = [rng.integers(0, 500, (8, 8)).astype(np.int16) for _ in range(4)]
    # write out of order; sorting is by z position
    for i, z in enumerate([9.0, 3.0, 6.0, 0.0]):
        _write_dicom(str(tmp_path / f"f{i}.dcm"), slices[i], z=z, instance=i,
                     explicit=True)
    vol, zooms = read_dicom_series(str(tmp_path))
    assert vol.shape == (8, 8, 4)
    order = [3, 1, 2, 0]  # by z: 0,3,6,9
    for k, i in enumerate(order):
        np.testing.assert_allclose(vol[:, :, k],
                                   slices[i].astype(np.float32) * 2.0 - 1024.0)
    np.testing.assert_allclose(zooms, (0.9766, 0.9766, 3.0))


def test_dataset_tool_step(tmp_path):
    from gantrack_tpu.data.preprocess.nifti import read_nifti
    from gantrack_tpu.tools.dataset_tool import step_dicom_to_nifti

    rng = np.random.default_rng(2)
    src = tmp_path / "dicom" / "P001"
    src.mkdir(parents=True)
    for i in range(3):
        _write_dicom(str(src / f"{i}.dcm"),
                     rng.integers(0, 100, (8, 8)).astype(np.int16),
                     z=3.0 * i, instance=i, explicit=True)
    dest = tmp_path / "nifti"
    step_dicom_to_nifti(str(tmp_path / "dicom"), str(dest))
    vol, zooms = read_nifti(str(dest / "P001.nii.gz"))
    assert vol.shape == (8, 8, 3)
    np.testing.assert_allclose(zooms, (0.9766, 0.9766, 3.0), rtol=1e-4)


def test_compressed_rejected(tmp_path):
    p = str(tmp_path / "c.dcm")
    meta = _el_explicit(0x0002, 0x0010, b"UI", _pad("1.2.840.10008.1.2.4.70"))
    with open(p, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta)
    with pytest.raises(ValueError, match="JPEG Lossless SV1"):
        read_dicom_file(p)


def _write_dicom_oriented(path, px, pos, orient, instance, thickness="5.0"):
    """Explicit-VR file with full ImagePositionPatient / OrientationPatient."""
    meta = _el_explicit(0x0002, 0x0010, b"UI", _pad("1.2.840.10008.1.2.1"))
    rows, cols = px.shape
    body = b"".join([
        _el_explicit(0x0018, 0x0050, b"DS", _pad(thickness)),
        _el_explicit(0x0020, 0x0013, b"IS", _pad(str(instance))),
        _el_explicit(0x0020, 0x0032, b"DS",
                     _pad("\\".join(str(v) for v in pos))),
        _el_explicit(0x0020, 0x0037, b"DS",
                     _pad("\\".join(str(v) for v in orient))),
        _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
        _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
        _el_explicit(0x0028, 0x0030, b"DS", _pad("1.0\\1.0")),
        _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        _el_explicit(0x0028, 0x0103, b"US", struct.pack("<H", 1)),
        _el_explicit(0x7FE0, 0x0010, b"OW", px.astype("<i2").tobytes()),
    ])
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)


def test_series_sorts_along_slice_normal_coronal(tmp_path):
    """Coronal series: slices must be ordered by the projection of
    ImagePositionPatient onto the slice normal row_dir x col_dir — like
    dicom2nifti's sort — NOT by the (constant) z component.  Hand-computed
    geometry: orientation (1,0,0),(0,0,-1) -> normal = (0,1,0), so the
    sort key is patient-y, ascending."""
    slices = [np.full((4, 4), i * 10, np.int16) for i in range(3)]
    ys = [0.0, 4.0, 8.0]  # patient-y of slice i; written out of order
    for k, i in enumerate([1, 2, 0]):
        _write_dicom_oriented(
            str(tmp_path / f"f{k}.dcm"), slices[i],
            pos=(0.0, ys[i], 50.0), orient=(1, 0, 0, 0, 0, -1), instance=k)
    vol, zooms = read_dicom_series(str(tmp_path))
    for k in range(3):  # sorted by ascending y == original slice index
        np.testing.assert_allclose(vol[:, :, k],
                                   np.full((4, 4), k * 10, np.float32))
    # spacing from inter-slice geometry (4.0), not SliceThickness (5.0)
    np.testing.assert_allclose(zooms[2], 4.0)


def test_series_skips_stray_files(tmp_path):
    """DICOMDIR/README junk in a series directory is skipped, not fatal."""
    rng = np.random.default_rng(3)
    for i in range(2):
        _write_dicom(str(tmp_path / f"f{i}.dcm"),
                     rng.integers(0, 100, (4, 4)).astype(np.int16),
                     z=2.0 * i, instance=i, explicit=True)
    (tmp_path / "README.txt").write_text("not dicom")
    (tmp_path / "DICOMDIR").write_bytes(b"\x00" * 200)
    vol, _ = read_dicom_series(str(tmp_path))
    assert vol.shape == (4, 4, 2)


def test_series_geometric_spacing_beats_tag(tmp_path):
    """Inter-slice distance 2.5 with SliceThickness=3.0: dicom2nifti uses
    the geometry; so do we."""
    rng = np.random.default_rng(4)
    for i in range(3):
        _write_dicom(str(tmp_path / f"f{i}.dcm"),
                     rng.integers(0, 100, (4, 4)).astype(np.int16),
                     z=2.5 * i, instance=i, explicit=True)
    _, zooms = read_dicom_series(str(tmp_path))
    np.testing.assert_allclose(zooms[2], 2.5)


# ---------------------------------------------------------------- envelope
# Round-4 widening: RLE Lossless + JPEG Baseline + JPEG 2000 + Deflated LE
# decode, undefined-length SQ skipping, named transfer-syntax rejection,
# gantry-tilt / non-uniform-spacing fixtures
# (reference: dicom2nifti consumption at dataset_tool_mi.py:226-255).

def _rle_encode_plane(plane: bytes) -> bytes:
    """Literal-only PackBits encoding (valid, if not compact)."""
    out = bytearray()
    for i in range(0, len(plane), 128):
        chunk = plane[i:i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def _encapsulate(fragments):
    body = struct.pack("<HHI", 0xFFFE, 0xE000, 0)  # empty Basic Offset Table
    for fr in fragments:
        if len(fr) % 2:
            fr += b"\x00"
        body += struct.pack("<HHI", 0xFFFE, 0xE000, len(fr)) + fr
    body += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    return body


def _write_compressed_dicom(path, px, ts, pixel_payload, z=0.0, instance=0,
                            bits=16, signed=True, extra=b""):
    meta = _el_explicit(0x0002, 0x0010, b"UI", _pad(ts))
    rows, cols = px.shape
    body = b"".join([
        _el_explicit(0x0018, 0x0050, b"DS", _pad("3.0")),
        _el_explicit(0x0020, 0x0013, b"IS", _pad(str(instance))),
        _el_explicit(0x0020, 0x0032, b"DS", _pad(f"0\\0\\{z}")),
        extra,
        _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
        _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
        _el_explicit(0x0028, 0x0030, b"DS", _pad("1.0\\1.0")),
        _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", bits)),
        _el_explicit(0x0028, 0x0103, b"US", struct.pack("<H", int(signed))),
        # encapsulated pixel data: OB with undefined length
        struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00"
        + struct.pack("<I", 0xFFFFFFFF) + pixel_payload,
    ])
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)


def test_rle_lossless_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    px = rng.integers(-1000, 2000, (16, 12)).astype(np.int16)
    be = px.astype(">i2").tobytes()
    msb, lsb = be[0::2], be[1::2]
    frag = (struct.pack("<I", 2)
            + struct.pack("<15I", *([64, 64 + len(_rle_encode_plane(msb))]
                                    + [0] * 13))
            + _rle_encode_plane(msb) + _rle_encode_plane(lsb))
    p = str(tmp_path / "rle.dcm")
    _write_compressed_dicom(p, px, "1.2.840.10008.1.2.5", _encapsulate([frag]))
    d = read_dicom_file(p)
    np.testing.assert_array_equal(d["pixels"], px.astype(np.float32))


def test_jpeg_baseline_decodes_via_pil(tmp_path):
    import io
    from PIL import Image

    rng = np.random.default_rng(8)
    px = rng.integers(0, 255, (16, 16)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(px, "L").save(buf, "JPEG", quality=95)
    p = str(tmp_path / "jpg.dcm")
    _write_compressed_dicom(p, px.astype(np.int16), "1.2.840.10008.1.2.4.50",
                            _encapsulate([buf.getvalue()]), bits=8, signed=False)
    d = read_dicom_file(p)
    assert d["pixels"].shape == (16, 16)
    # lossy: close, not exact
    assert float(np.mean(np.abs(d["pixels"] - px))) < 10.0


def test_jpeg2000_lossless_roundtrip(tmp_path):
    import io
    from PIL import Image

    rng = np.random.default_rng(9)
    px = rng.integers(0, 255, (16, 16)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(px, "L").save(buf, "JPEG2000", irreversible=False)
    p = str(tmp_path / "j2k.dcm")
    _write_compressed_dicom(p, px.astype(np.int16), "1.2.840.10008.1.2.4.90",
                            _encapsulate([buf.getvalue()]), bits=8, signed=False)
    d = read_dicom_file(p)
    np.testing.assert_array_equal(d["pixels"], px.astype(np.float32))


def test_deflated_explicit_le(tmp_path):
    import zlib

    rng = np.random.default_rng(10)
    px = rng.integers(-50, 300, (8, 8)).astype(np.int16)
    # build the explicit-LE dataset, deflate everything after the meta group
    body = b"".join([
        _el_explicit(0x0020, 0x0013, b"IS", _pad("1")),
        _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", 8)),
        _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", 8)),
        _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        _el_explicit(0x0028, 0x0103, b"US", struct.pack("<H", 1)),
        _el_explicit(0x7FE0, 0x0010, b"OW", px.astype("<i2").tobytes()),
    ])
    comp = zlib.compressobj(wbits=-15)
    deflated = comp.compress(body) + comp.flush()
    meta = _el_explicit(0x0002, 0x0010, b"UI", _pad("1.2.840.10008.1.2.1.99"))
    p = str(tmp_path / "defl.dcm")
    with open(p, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + deflated)
    d = read_dicom_file(p)
    np.testing.assert_array_equal(d["pixels"], px.astype(np.float32))


def test_unsupported_syntax_named(tmp_path):
    p = str(tmp_path / "jll.dcm")
    meta = _el_explicit(0x0002, 0x0010, b"UI", _pad("1.2.840.10008.1.2.4.70"))
    with open(p, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta)
    with pytest.raises(ValueError, match="JPEG Lossless SV1"):
        read_dicom_file(p)


def test_undefined_length_sequence_skipped(tmp_path):
    """A referenced-image SQ with undefined length must be skipped, not
    fatal (routine in clinical exports)."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 100, (4, 4)).astype(np.int16)
    item = (struct.pack("<HHI", 0xFFFE, 0xE000, 0xFFFFFFFF)
            + _el_explicit(0x0008, 0x1150, b"UI", _pad("1.2.3"))
            + struct.pack("<HHI", 0xFFFE, 0xE00D, 0))
    sq = (struct.pack("<HH", 0x0008, 0x1140) + b"SQ\x00\x00"
          + struct.pack("<I", 0xFFFFFFFF) + item
          + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))
    meta = _el_explicit(0x0002, 0x0010, b"UI", _pad("1.2.840.10008.1.2.1"))
    body = sq + b"".join([
        _el_explicit(0x0028, 0x0010, b"US", struct.pack("<H", 4)),
        _el_explicit(0x0028, 0x0011, b"US", struct.pack("<H", 4)),
        _el_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        _el_explicit(0x0028, 0x0103, b"US", struct.pack("<H", 1)),
        _el_explicit(0x7FE0, 0x0010, b"OW", px.astype("<i2").tobytes()),
    ])
    p = str(tmp_path / "sq.dcm")
    with open(p, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)
    d = read_dicom_file(p)
    np.testing.assert_array_equal(d["pixels"], px.astype(np.float32))


def test_rle_series_through_dataset_tool(tmp_path):
    """RLE series end-to-end through the DICOM->NIfTI step."""
    from gantrack_tpu.data.preprocess.nifti import read_nifti
    from gantrack_tpu.tools.dataset_tool import step_dicom_to_nifti

    rng = np.random.default_rng(12)
    src = tmp_path / "dicom" / "P001"
    src.mkdir(parents=True)
    for i in range(3):
        px = rng.integers(-200, 800, (8, 8)).astype(np.int16)
        be = px.astype(">i2").tobytes()
        msb, lsb = be[0::2], be[1::2]
        frag = (struct.pack("<I", 2)
                + struct.pack("<15I", *([64, 64 + len(_rle_encode_plane(msb))]
                                        + [0] * 13))
                + _rle_encode_plane(msb) + _rle_encode_plane(lsb))
        _write_compressed_dicom(str(src / f"{i}.dcm"), px,
                                "1.2.840.10008.1.2.5", _encapsulate([frag]),
                                z=2.0 * i, instance=i)
    dest = tmp_path / "nifti"
    step_dicom_to_nifti(str(tmp_path / "dicom"), str(dest))
    vol, zooms = read_nifti(str(dest / "P001.nii.gz"))
    assert vol.shape == (8, 8, 3)
    np.testing.assert_allclose(zooms[2], 2.0, rtol=1e-4)


def test_nonuniform_spacing_warns(tmp_path):
    rng = np.random.default_rng(13)
    for i, z in enumerate([0.0, 2.5, 6.0]):  # gaps: 2.5, 3.5
        _write_dicom(str(tmp_path / f"f{i}.dcm"),
                     rng.integers(0, 100, (4, 4)).astype(np.int16),
                     z=z, instance=i, explicit=True)
    with pytest.warns(UserWarning, match="non-uniform slice spacing"):
        vol, zooms = read_dicom_series(str(tmp_path))
    assert vol.shape == (4, 4, 3)


def test_gantry_tilt_warns(tmp_path):
    """Axial stack whose per-slice positions shift in-plane (gantry tilt):
    stacked with a warning, slice spacing from the normal projection."""
    for i in range(3):
        _write_dicom_oriented(
            str(tmp_path / f"f{i}.dcm"), np.full((4, 4), i, np.int16),
            pos=(0.0, 1.5 * i, 3.0 * i), orient=(1, 0, 0, 0, 1, 0),
            instance=i)
    with pytest.warns(UserWarning, match="gantry-tilted"):
        vol, zooms = read_dicom_series(str(tmp_path))
    assert vol.shape == (4, 4, 3)
    np.testing.assert_allclose(zooms[2], 3.0)
