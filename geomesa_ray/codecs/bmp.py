"""Uncompressed 24-bit Windows BMP (BITMAPINFOHEADER, BI_RGB).

Bottom-up row order, BGR channel order, rows padded to 4 bytes — the
classic interchange format; both directions are pure NumPy reshapes.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> BMP bytes."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"BMP encoder needs (h, w, 3), got {arr.shape}")
    h, w = arr.shape[:2]
    pad = (-(w * 3)) % 4
    row_bytes = w * 3 + pad
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, :w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = body.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(buf: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack_from("<I", buf, 10)
    hdr_size, w, h, planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", buf, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={comp} (24-bit BI_RGB only)")
    flip = h > 0
    h = abs(h)
    pad = (-(w * 3)) % 4
    row_bytes = w * 3 + pad
    data = np.frombuffer(buf, dtype=np.uint8, count=h * row_bytes,
                         offset=off).reshape(h, row_bytes)
    rgb = data[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]
    if flip:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)
