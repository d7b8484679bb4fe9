"""JPEG-LS (T.87) codec tests (VERDICT r4 #10).

Round-trip across bit depths / shapes / NEAR values, stream-level checks
of the marker envelope, hand-computed first-bytes of a trivially-
predictable stream, and the DICOM wiring."""

import struct

import numpy as np
import pytest

from gantrack_tpu.data.preprocess import jpegls


def _roundtrip(img, bits=None, near=0):
    stream = jpegls.encode(img, bits=bits, near=near)
    dec, p = jpegls.decode(stream)
    return stream, dec


@pytest.mark.parametrize("bits", [8, 10, 12, 16])
def test_roundtrip_random_lossless(bits):
    rng = np.random.default_rng(bits)
    img = rng.integers(0, (1 << bits), (23, 31), dtype=np.uint32)
    _, dec = _roundtrip(img, bits=bits)
    np.testing.assert_array_equal(dec, img)


def test_roundtrip_structured_ct_like():
    """Smooth anatomy + flat air regions (exercises run mode heavily) at
    12-bit CT dynamic range."""
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float64) / 64 - 0.5
    img = np.zeros((64, 64))
    body = (xx / 0.4) ** 2 + (yy / 0.35) ** 2 < 1
    img[body] = 1800 + 600 * np.cos(xx * 9)[body] + 300 * np.sin(yy * 7)[body]
    img += np.random.default_rng(0).integers(0, 8, img.shape)
    img = np.clip(img, 0, 4095).astype(np.uint16)
    _, dec = _roundtrip(img, bits=12)
    np.testing.assert_array_equal(dec, img)


@pytest.mark.parametrize("shape", [(1, 1), (1, 64), (64, 1), (3, 5), (17, 2)])
def test_roundtrip_degenerate_shapes(shape):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, shape, dtype=np.uint32)
    _, dec = _roundtrip(img, bits=8)
    np.testing.assert_array_equal(dec, img)


def test_roundtrip_flat_and_gradient():
    flat = np.full((32, 32), 100, np.uint32)
    _, dec = _roundtrip(flat, bits=8)
    np.testing.assert_array_equal(dec, flat)
    grad = (np.arange(32)[None, :] * np.ones((32, 1))).astype(np.uint32) * 8
    _, dec = _roundtrip(grad, bits=8)
    np.testing.assert_array_equal(dec, grad)


@pytest.mark.parametrize("near", [1, 2, 3])
def test_near_lossless_error_bound(near):
    rng = np.random.default_rng(near)
    img = rng.integers(0, 4096, (31, 29), dtype=np.uint32)
    _, dec = _roundtrip(img, bits=12, near=near)
    assert int(np.abs(dec.astype(np.int64) - img.astype(np.int64)).max()) <= near


def test_flat_image_compresses_to_runs():
    """All-equal lines hit run mode; the stream must be tiny (a 64×64
    flat image is ~64 run-coded lines, far below 1 byte/sample)."""
    img = np.full((64, 64), 77, np.uint32)
    stream, dec = _roundtrip(img, bits=8)
    np.testing.assert_array_equal(dec, img)
    assert len(stream) < 120, len(stream)


def test_stream_envelope_and_defaults():
    img = np.zeros((4, 4), np.uint32)
    stream = jpegls.encode(img, bits=8)
    assert stream[:2] == b"\xff\xd8"           # SOI
    assert stream[-2:] == b"\xff\xd9"          # EOI
    marker, seglen, p, y, x, nf = struct.unpack(">HHBHHB", stream[2:12])
    assert (marker, seglen, p, y, x, nf) == (0xFFF7, 11, 8, 4, 4, 1)
    assert jpegls.default_thresholds(255, 0) == (3, 7, 21, 64)
    assert jpegls.default_thresholds(4095, 0) == (18, 67, 276, 64)


def test_first_sample_is_regular_mode_golomb():
    """First sample of a non-flat image: all context gradients are 0 is
    false only from x≥1; x=0 of line 0 has a=b=c=d=0 ⇒ RUN mode with
    Ra=0.  A stream starting with value 0 then a jump must begin with a
    broken-run code (bit 0) — checked by decoding by hand."""
    img = np.array([[0, 200, 200, 200]], np.uint32)
    stream = jpegls.encode(img, bits=8)
    _, dec = _roundtrip(img, bits=8)
    np.testing.assert_array_equal(dec, img)
    # entropy data begins after the 20-byte header (SOI+SOF55+comp+SOS)
    body = stream[20:-2]
    # run of 1 (the leading 0 with J[0]=0 bits) -> first bit is 0
    assert (body[0] >> 7) == 0


def test_unsupported_features_raise_named():
    img = np.zeros((4, 4), np.uint32)
    stream = bytearray(jpegls.encode(img, bits=8))
    # corrupt Nf to 3 components
    assert stream[11] == 1
    stream[11] = 3
    with pytest.raises(ValueError, match="3-component"):
        jpegls.decode(bytes(stream))
    with pytest.raises(ValueError, match="SOI"):
        jpegls.decode(b"\x00\x00")


def test_dicom_jpegls_transfer_syntax_decodes(tmp_path):
    """A synthetic DICOM file with the JPEG-LS Lossless transfer syntax
    round-trips through read_dicom_file."""
    from gantrack_tpu.data.preprocess.dicom import read_dicom_file
    from test_dicom import _encapsulate, _write_compressed_dicom

    rng = np.random.default_rng(5)
    px = rng.integers(0, 4096, (16, 16), dtype=np.uint16)
    stream = jpegls.encode(px, bits=12)
    p = str(tmp_path / "jls.dcm")
    _write_compressed_dicom(p, px.astype(np.int16),
                            "1.2.840.10008.1.2.4.80",
                            _encapsulate([stream]), bits=12, signed=False)
    rec = read_dicom_file(p)
    np.testing.assert_array_equal(rec["pixels"], px.astype(np.float32))
