"""Minimal DICOM reader/writer for CT series.

The reference depends on pydicom (data/slice_interpolation_dataset.py:489-573)
to read uncompressed CT slices, sort them by ImagePositionPatient-z (falling
back to InstanceNumber) and apply RescaleSlope/Intercept to get HU. This
module uses pydicom when available and otherwise falls back to a built-in
parser that handles the subset CT archives actually use: little-endian
explicit/implicit VR, uncompressed 16-bit PixelData. A matching writer exists
so tests can round-trip without any external data.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

try:
    import pydicom  # type: ignore

    _HAVE_PYDICOM = True
except Exception:  # pragma: no cover
    _HAVE_PYDICOM = False

_MAGIC_OFFSET = 128
_MAGIC = b"DICM"

# (group, element) tags we care about
TAG_INSTANCE_NUMBER = (0x0020, 0x0013)
TAG_IMAGE_POSITION = (0x0020, 0x0032)
TAG_SLICE_THICKNESS = (0x0018, 0x0050)
TAG_PIXEL_SPACING = (0x0028, 0x0030)
TAG_ROWS = (0x0028, 0x0010)
TAG_COLS = (0x0028, 0x0011)
TAG_BITS_ALLOCATED = (0x0028, 0x0100)
TAG_PIXEL_REPRESENTATION = (0x0028, 0x0103)
TAG_RESCALE_INTERCEPT = (0x0028, 0x1052)
TAG_RESCALE_SLOPE = (0x0028, 0x1053)
TAG_TRANSFER_SYNTAX = (0x0002, 0x0010)
TAG_PIXEL_DATA = (0x7FE0, 0x0010)

_EXPLICIT_LE = "1.2.840.10008.1.2.1"
_IMPLICIT_LE = "1.2.840.10008.1.2"

# VRs with a 2-byte reserved field + 4-byte length in explicit VR
_LONG_VRS = {b"OB", b"OW", b"OF", b"SQ", b"UT", b"UN"}


@dataclass
class DicomSlice:
    pixels: np.ndarray  # (rows, cols) float32 HU
    instance_number: int
    z_position: float
    slice_thickness: float
    pixel_spacing: Tuple[float, float]


def _parse_elements(
    buf: bytes, explicit: bool, start: int = 0, stop_after_group2: bool = False
) -> Tuple[Dict[Tuple[int, int], bytes], int]:
    """Parse top-level data elements (no nested sequences needed for CT).

    Returns (elements, end offset). With stop_after_group2 the walk covers
    only the always-explicit file-meta group (0002,xxxx) so the dataset body
    can be re-parsed with the transfer syntax's own VR mode.
    """
    out: Dict[Tuple[int, int], bytes] = {}
    i = start
    n = len(buf)
    while i + 8 <= n:
        group, elem = struct.unpack_from("<HH", buf, i)
        if stop_after_group2 and group != 0x0002:
            break
        i += 4
        if explicit or group == 0x0002:  # file-meta group is always explicit
            vr = buf[i : i + 2]
            if vr in _LONG_VRS:
                length = struct.unpack_from("<I", buf, i + 4)[0]
                i += 8
            else:
                length = struct.unpack_from("<H", buf, i + 2)[0]
                i += 4
        else:
            length = struct.unpack_from("<I", buf, i)[0]
            i += 4
        if length == 0xFFFFFFFF:
            raise ValueError("undefined-length elements (compressed?) unsupported")
        out[(group, elem)] = buf[i : i + length]
        i += length
        if (group, elem) == TAG_PIXEL_DATA:
            break
    return out, i


def _read_builtin(path: str) -> DicomSlice:
    with open(path, "rb") as f:
        data = f.read()
    if data[_MAGIC_OFFSET : _MAGIC_OFFSET + 4] != _MAGIC:
        raise ValueError(f"{path}: not a part-10 DICOM file")
    body = data[_MAGIC_OFFSET + 4 :]
    # Pass 1: file-meta group only (always explicit VR) -> transfer syntax.
    meta, body_start = _parse_elements(body, explicit=True, stop_after_group2=True)
    ts = meta.get(TAG_TRANSFER_SYNTAX, _EXPLICIT_LE.encode()).decode().strip("\x00 ")
    if ts not in (_EXPLICIT_LE, _IMPLICIT_LE):
        raise ValueError(f"{path}: unsupported transfer syntax {ts}")
    # Pass 2: dataset body in the syntax's VR mode, starting after the meta.
    elems, _ = _parse_elements(body, explicit=(ts == _EXPLICIT_LE), start=body_start)

    def dec_str(tag, default=""):
        raw = elems.get(tag)
        return raw.decode("ascii", "ignore").strip("\x00 ") if raw else default

    def dec_int(tag, default=0):
        s = dec_str(tag)
        return int(float(s)) if s else default

    def dec_us(tag, default=0):
        raw = elems.get(tag)
        return struct.unpack("<H", raw[:2])[0] if raw else default

    rows = dec_us(TAG_ROWS)
    cols = dec_us(TAG_COLS)
    bits = dec_us(TAG_BITS_ALLOCATED, 16)
    signed = dec_us(TAG_PIXEL_REPRESENTATION, 0) == 1
    slope = float(dec_str(TAG_RESCALE_SLOPE, "1") or 1)
    intercept = float(dec_str(TAG_RESCALE_INTERCEPT, "0") or 0)
    pos = dec_str(TAG_IMAGE_POSITION, "0\\0\\0").split("\\")
    z = float(pos[2]) if len(pos) == 3 else 0.0
    spacing = dec_str(TAG_PIXEL_SPACING, "1\\1").split("\\")
    ps = (float(spacing[0]), float(spacing[-1])) if spacing[0] else (1.0, 1.0)

    raw = elems.get(TAG_PIXEL_DATA)
    if raw is None:
        raise ValueError(f"{path}: no PixelData")
    dtype = {16: (np.int16 if signed else np.uint16), 8: (np.int8 if signed else np.uint8)}[bits]
    arr = np.frombuffer(raw[: rows * cols * (bits // 8)], dtype=dtype).reshape(rows, cols)
    hu = arr.astype(np.float32) * slope + intercept
    return DicomSlice(
        pixels=hu,
        instance_number=dec_int(TAG_INSTANCE_NUMBER),
        z_position=z,
        slice_thickness=float(dec_str(TAG_SLICE_THICKNESS, "1") or 1),
        pixel_spacing=ps,
    )


def _read_pydicom(path: str) -> DicomSlice:  # pragma: no cover - env without pydicom
    ds = pydicom.dcmread(path)
    slope = float(getattr(ds, "RescaleSlope", 1.0))
    intercept = float(getattr(ds, "RescaleIntercept", 0.0))
    hu = ds.pixel_array.astype(np.float32) * slope + intercept
    pos = getattr(ds, "ImagePositionPatient", [0, 0, 0])
    spacing = getattr(ds, "PixelSpacing", [1.0, 1.0])
    return DicomSlice(
        pixels=hu,
        instance_number=int(getattr(ds, "InstanceNumber", 0)),
        z_position=float(pos[2]),
        slice_thickness=float(getattr(ds, "SliceThickness", 1.0)),
        pixel_spacing=(float(spacing[0]), float(spacing[1])),
    )


def read_dicom_slice(path: str) -> DicomSlice:
    if _HAVE_PYDICOM:
        return _read_pydicom(path)
    return _read_builtin(path)


def load_dicom_volume(directory: str) -> Tuple[np.ndarray, float]:
    """Load and z-sort a DICOM series directory into (D, H, W) HU + thickness.

    Sorting: ImagePositionPatient-z primary, InstanceNumber fallback
    (reference data/slice_interpolation_dataset.py:489-573).
    """
    files = [
        os.path.join(directory, f)
        for f in sorted(os.listdir(directory))
        if not f.startswith(".")
    ]
    slices: List[DicomSlice] = []
    for f in files:
        try:
            slices.append(read_dicom_slice(f))
        except (ValueError, struct.error, KeyError):
            continue
    if not slices:
        raise ValueError(f"no readable DICOM slices in {directory}")
    zs = [s.z_position for s in slices]
    if len(set(zs)) > 1:
        slices.sort(key=lambda s: s.z_position)
    else:
        slices.sort(key=lambda s: s.instance_number)
    vol = np.stack([s.pixels for s in slices], axis=0)
    return vol, slices[0].slice_thickness


# ------------------------------------------------------------------- writer
def _enc_elem(group: int, elem: int, vr: bytes, value: bytes, explicit: bool = True) -> bytes:
    if len(value) % 2:
        value += b"\x00"
    head = struct.pack("<HH", group, elem)
    if not explicit and group != 0x0002:
        return head + struct.pack("<I", len(value)) + value
    if vr in _LONG_VRS:
        return head + vr + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return head + vr + struct.pack("<H", len(value)) + value


def write_minimal_dicom(
    path: str,
    pixels_hu: np.ndarray,
    instance_number: int,
    z_position: float,
    slice_thickness: float = 1.0,
    pixel_spacing: Tuple[float, float] = (1.0, 1.0),
    rescale_intercept: float = -1024.0,
    explicit_vr: bool = True,
) -> None:
    """Write a part-10 CT slice (explicit- or implicit-VR LE) our reader
    (and pydicom) parse. Stores (HU - intercept) as uint16 with RescaleSlope=1."""
    rows, cols = pixels_hu.shape
    stored = np.clip(pixels_hu - rescale_intercept, 0, 65535).astype("<u2")
    e = explicit_vr

    def elem(g, el, vr, val):
        return _enc_elem(g, el, vr, val, explicit=e)

    body = b""
    body += elem(0x0008, 0x0060, b"CS", b"CT")
    body += elem(0x0018, 0x0050, b"DS", f"{slice_thickness}".encode())
    body += elem(0x0020, 0x0013, b"IS", f"{instance_number}".encode())
    body += elem(0x0020, 0x0032, b"DS", f"0\\0\\{z_position}".encode())
    body += elem(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    body += elem(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    body += elem(
        0x0028, 0x0030, b"DS", f"{pixel_spacing[0]}\\{pixel_spacing[1]}".encode()
    )
    body += elem(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    body += elem(0x0028, 0x0103, b"US", struct.pack("<H", 0))
    body += elem(0x0028, 0x1052, b"DS", f"{rescale_intercept}".encode())
    body += elem(0x0028, 0x1053, b"DS", b"1")
    body += elem(0x7FE0, 0x0010, b"OW", stored.tobytes())

    ts = (_EXPLICIT_LE if explicit_vr else _IMPLICIT_LE).encode()
    meta = _enc_elem(0x0002, 0x0010, b"UI", ts, explicit=True)
    with open(path, "wb") as f:
        f.write(b"\x00" * _MAGIC_OFFSET + _MAGIC + meta + body)
