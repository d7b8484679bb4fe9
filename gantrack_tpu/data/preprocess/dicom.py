"""Minimal native DICOM series reader → NIfTI.

The reference converts DICOM series with the ``dicom2nifti`` package
(``dataset_tool_mi.py:226-255``), which is not installable in this
environment.  This module implements the subset the CT/MR pipeline
needs natively: single-frame, uncompressed DICOM files in

* Implicit VR Little Endian  (1.2.840.10008.1.2)
* Explicit VR Little Endian  (1.2.840.10008.1.2.1)

parsing only the tags required to assemble a volume (geometry, rescale,
pixel data).  Compressed transfer syntaxes raise with a clear message.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

IMPLICIT_VR_LE = "1.2.840.10008.1.2"
EXPLICIT_VR_LE = "1.2.840.10008.1.2.1"

# VRs with a 2-byte reserved field and 4-byte length in explicit mode.
_LONG_VRS = {b"OB", b"OW", b"OF", b"SQ", b"UT", b"UN"}

_TAGS = {
    (0x0002, 0x0010): "transfer_syntax",
    (0x0018, 0x0050): "slice_thickness",
    (0x0018, 0x0088): "spacing_between_slices",
    (0x0020, 0x0013): "instance_number",
    (0x0020, 0x0032): "image_position",
    (0x0020, 0x0037): "image_orientation",
    (0x0028, 0x0010): "rows",
    (0x0028, 0x0011): "cols",
    (0x0028, 0x0030): "pixel_spacing",
    (0x0028, 0x0100): "bits_allocated",
    (0x0028, 0x0103): "pixel_representation",
    (0x0028, 0x1052): "rescale_intercept",
    (0x0028, 0x1053): "rescale_slope",
    (0x7FE0, 0x0010): "pixel_data",
}


def _parse_elements(buf: bytes, offset: int, explicit: bool,
                    stop_group: Optional[int] = None) -> Tuple[Dict, int]:
    out: Dict[str, object] = {}
    n = len(buf)
    while offset + 8 <= n:
        group, elem = struct.unpack_from("<HH", buf, offset)
        if stop_group is not None and group != stop_group:
            break
        offset += 4
        if explicit:
            vr = buf[offset : offset + 2]
            if vr in _LONG_VRS:
                length = struct.unpack_from("<I", buf, offset + 4)[0]
                offset += 8
            else:
                length = struct.unpack_from("<H", buf, offset + 2)[0]
                offset += 4
        else:
            vr = b"UN"
            length = struct.unpack_from("<I", buf, offset)[0]
            offset += 4
        if length == 0xFFFFFFFF:
            raise ValueError(
                "undefined-length element (sequence/encapsulated pixel data) "
                "— compressed DICOM is not supported by the native reader")
        value = buf[offset : offset + length]
        offset += length
        name = _TAGS.get((group, elem))
        if name:
            out[name] = (value, vr)
    return out, offset


def _ascii(v: Tuple[bytes, bytes]) -> str:
    return v[0].decode("ascii", "ignore").strip("\x00 ").strip()


def _floats(v) -> List[float]:
    return [float(x) for x in _ascii(v).split("\\") if x]


def _uint(v, text: bool = False) -> int:
    """Integer tag value.  ``text=True`` marks IS-VR tags (ASCII digits
    under implicit VR); binary US/UL otherwise — decided by tag, not by
    sniffing bytes (binary values can alias ASCII digits)."""
    raw, vr = v
    if vr == b"US":
        return struct.unpack("<H", raw)[0]
    if vr == b"UL":
        return struct.unpack("<I", raw)[0]
    if vr == b"UN":
        if text:
            return int(_ascii(v))
        if len(raw) == 2:
            return struct.unpack("<H", raw)[0]
        if len(raw) == 4:
            return struct.unpack("<I", raw)[0]
    return int(_ascii(v))


def read_dicom_file(path: str) -> Dict[str, object]:
    """One DICOM file → dict with ``pixels`` (float32 [H, W], rescaled),
    ``position_z``, ``instance``, ``pixel_spacing``, ``slice_spacing``."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[128:132] != b"DICM":
        raise ValueError(f"{path}: not a DICOM part-10 file (no DICM magic)")
    # File meta group (0002) is always explicit VR LE.
    meta, offset = _parse_elements(buf, 132, explicit=True, stop_group=0x0002)
    ts = _ascii(meta["transfer_syntax"]) if "transfer_syntax" in meta else EXPLICIT_VR_LE
    if ts == EXPLICIT_VR_LE:
        explicit = True
    elif ts == IMPLICIT_VR_LE:
        explicit = False
    else:
        raise ValueError(
            f"{path}: transfer syntax {ts} is compressed/unsupported; the "
            "native reader handles uncompressed little-endian only "
            "(convert externally or install dicom2nifti)")
    tags, _ = _parse_elements(buf, offset, explicit=explicit)

    rows = _uint(tags["rows"])
    cols = _uint(tags["cols"])
    bits = _uint(tags.get("bits_allocated", (b"16", b"UN"))) if "bits_allocated" in tags else 16
    signed = bool(_uint(tags["pixel_representation"])) if "pixel_representation" in tags else False
    raw = tags["pixel_data"][0]
    dtype = {8: np.uint8, 16: np.int16 if signed else np.uint16}[bits]
    px = np.frombuffer(raw[: rows * cols * (bits // 8)], dtype=dtype).reshape(rows, cols)
    slope = _floats(tags["rescale_slope"])[0] if "rescale_slope" in tags else 1.0
    inter = _floats(tags["rescale_intercept"])[0] if "rescale_intercept" in tags else 0.0
    pixels = px.astype(np.float32) * slope + inter

    pos = _floats(tags["image_position"]) if "image_position" in tags else [0.0, 0.0, 0.0]
    pos = (pos + [0.0, 0.0, 0.0])[:3]
    orient = (_floats(tags["image_orientation"])
              if "image_orientation" in tags else [1, 0, 0, 0, 1, 0])
    spacing = _floats(tags["pixel_spacing"]) if "pixel_spacing" in tags else [1.0, 1.0]
    z_sp = None
    for key in ("spacing_between_slices", "slice_thickness"):
        if key in tags:
            z_sp = _floats(tags[key])[0]
            break
    return {
        "pixels": pixels,
        "position": pos,
        "position_z": pos[2],
        "orientation": orient,
        "instance": (_uint(tags["instance_number"], text=True)
                     if "instance_number" in tags else 0),
        "pixel_spacing": spacing,
        "slice_spacing": z_sp,
    }


def read_dicom_series(directory: str) -> Tuple[np.ndarray, Tuple[float, float, float]]:
    """All ``.dcm``/extensionless DICOM files in a directory → ([H, W, D]
    float32 volume sorted by slice position, (sy, sx, sz) spacing)."""
    files = sorted(
        os.path.join(directory, f) for f in os.listdir(directory)
        if not f.startswith(".") and os.path.isfile(os.path.join(directory, f))
    )
    # Stray non-DICOM files (DICOMDIR, README, .txt) are common in exported
    # series — skip anything without the part-10 magic instead of aborting.
    slices = []
    for p in files:
        with open(p, "rb") as f:
            head = f.read(132)
        if len(head) < 132 or head[128:132] != b"DICM":
            continue
        slices.append(read_dicom_file(p))
    if not slices:
        raise ValueError(f"no DICOM files under {directory}")
    # Sort along the slice NORMAL (row_dir × col_dir from
    # ImageOrientationPatient), like dicom2nifti's common.sort_dicoms —
    # raw z ordering is wrong for coronal/sagittal series and instance
    # numbers can run opposite to geometry.
    o = slices[0]["orientation"]
    normal = np.cross(o[0:3], o[3:6]).astype(np.float64)
    for s in slices:
        s["_proj"] = float(np.dot(s["position"], normal))
    slices.sort(key=lambda s: (s["_proj"], s["instance"]))
    vol = np.stack([s["pixels"] for s in slices], axis=2)
    sy, sx = slices[0]["pixel_spacing"]
    sz = slices[0]["slice_spacing"]
    projs = [s["_proj"] for s in slices]
    if len(projs) > 1:
        # Geometric spacing beats the SliceThickness tag (dicom2nifti uses
        # inter-slice distance; gaps/overlap make the tag unreliable).
        sz = float(np.median(np.diff(projs)))
    elif sz is None:
        sz = 1.0
    return vol, (float(sy), float(sx), float(abs(sz) or 1.0))


def dicom_series_to_nifti(src_dir: str, out_path: str) -> None:
    """Native replacement for ``dicom2nifti.dicom_series_to_nifti``
    (uncompressed series)."""
    from .nifti import write_nifti

    vol, zooms = read_dicom_series(src_dir)
    write_nifti(out_path, vol, zooms=zooms)
