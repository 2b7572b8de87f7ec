"""Pure-NumPy PNG codec (RFC 2083 / ISO 15948, stdlib zlib for DEFLATE).

Supports the still-image subset the corpus needs: 8-bit greyscale
(color type 0), truecolor RGB (2), and RGBA (6), non-interlaced, with
all five scanline filters on decode. Encode emits filter ``Up`` after
the first row (vectorizable both ways) unless ``filter_type`` forces a
specific filter per row — the forced path exists so tests can exercise
every decode filter against independently-built bytes.

Decode hot path: one ``zlib.decompress``, one reshape to (h, 1+stride)
rows, then per-row vectorized un-filtering (filters None/Up are full-row
NumPy ops; Sub/Average/Paeth recur on the previous pixel so they run a
per-pixel lane loop within the row — at corpus chunk sizes the row loop
is the cost, not python-per-byte).

Reference parity: GeoMesa rasters round-trip chunks through ImageIO
PNG/JPEG writers (``geomesa-raster/.../util/RasterUtils.scala``
``imageToBytes``); here the codec is explicit so the Ray actor-pool
stages can decode without native libs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over lanes (int16 math per spec)."""
    a = a.astype(np.int16)
    b = b.astype(np.int16)
    c = c.astype(np.int16)
    p = a + b - c
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(arr: np.ndarray, filter_type: int | None = None,
               level: int = 6) -> bytes:
    """(h, w) or (h, w, {3,4}) uint8 -> PNG bytes.

    ``filter_type`` forces one filter (0..4) on every row; default picks
    0 for the first row then 2 (Up).
    """
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color, nch = 0, 1
        arr = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color, nch = 2, 3
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color, nch = 6, 4
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    stride = w * nch
    flat = arr.reshape(h, stride)

    rows = np.empty((h, 1 + stride), dtype=np.uint8)
    for y in range(h):
        ft = filter_type
        if ft is None:
            ft = 0 if y == 0 else 2
        rows[y, 0] = ft
        raw = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ft == 0:
            rows[y, 1:] = raw
        elif ft == 1:  # Sub
            left = np.zeros(stride, dtype=np.uint8)
            left[nch:] = raw[:-nch]
            rows[y, 1:] = raw - left
        elif ft == 2:  # Up
            rows[y, 1:] = raw - prev
        elif ft == 3:  # Average
            left = np.zeros(stride, dtype=np.uint8)
            left[nch:] = raw[:-nch]
            avg = ((left.astype(np.uint16) + prev.astype(np.uint16)) // 2)
            rows[y, 1:] = raw - avg.astype(np.uint8)
        elif ft == 4:  # Paeth
            left = np.zeros(stride, dtype=np.uint8)
            left[nch:] = raw[:-nch]
            ul = np.zeros(stride, dtype=np.uint8)
            ul[nch:] = prev[:-nch]
            rows[y, 1:] = raw - _paeth(left, prev, ul)
        else:
            raise ValueError(f"bad filter_type {ft}")

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(rows.tobytes(), level)
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def encode_png_batch(imgs: np.ndarray, level: int = 6) -> list[bytes]:
    """(n, h, w, 3) uint8 stack -> n PNG byte strings, bit-identical to
    per-image :func:`encode_png` with the default filter choice (row 0
    None, rest Up). Scanline filtering vectorizes across the whole
    stack; only the DEFLATE call remains per image (zlib is C)."""
    imgs = np.ascontiguousarray(imgs, dtype=np.uint8)
    if imgs.ndim != 4 or imgs.shape[3] != 3:
        raise ValueError(f"batch encoder needs (n, h, w, 3), got "
                         f"{imgs.shape}")
    n, h, w = imgs.shape[:3]
    if n == 0:
        return []
    if h == 0 or w == 0:
        raise ValueError("empty image")
    stride = w * 3
    flat = imgs.reshape(n, h, stride)
    rows = np.empty((n, h, 1 + stride), dtype=np.uint8)
    rows[:, 0, 0] = 0
    rows[:, 1:, 0] = 2  # Up
    rows[:, 0, 1:] = flat[:, 0]
    rows[:, 1:, 1:] = flat[:, 1:] - flat[:, :-1]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    head = _SIG + _chunk(b"IHDR", ihdr)
    return [head
            + _chunk(b"IDAT", zlib.compress(rows[i].tobytes(), level))
            + _chunk(b"IEND", b"")
            for i in range(n)]


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> (h, w) uint8 (grey) or (h, w, {3,4}) uint8."""
    if buf[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = []
    n = len(buf)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4:pos + 8]
        body = buf[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", buf, pos + 8 + length)
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        # ancillary chunks are skipped
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr)
    if depth != 8:
        raise NotImplementedError(f"bit depth {depth} (8 only)")
    if comp != 0 or filt != 0:
        raise ValueError("bad compression/filter method")
    if interlace != 0:
        raise NotImplementedError("Adam7 interlace not supported")
    nch = {0: 1, 2: 3, 6: 4}.get(color)
    if nch is None:
        raise NotImplementedError(f"color type {color} (grey/RGB/RGBA only)")
    stride = w * nch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG data length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    out = np.empty((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = int(rows[y, 0])
        line = rows[y, 1:]
        prev = out[y - 1] if y > 0 else zero
        if ft == 0:
            out[y] = line
        elif ft == 2:  # Up
            out[y] = line + prev
        elif ft == 1:  # Sub: recon[x] = line[x] + recon[x-nch]
            # per-lane cumulative sum mod 256 vectorizes the recursion
            lanes = line.reshape(w, nch).astype(np.uint32)
            out[y] = np.cumsum(lanes, axis=0, dtype=np.uint32) \
                .astype(np.uint8).reshape(stride)
        elif ft == 3:  # Average — sequential on left neighbour
            o = out[y]
            p16 = prev.astype(np.uint16)
            for x in range(stride):
                left = o[x - nch] if x >= nch else 0
                o[x] = (int(line[x]) + ((int(left) + int(p16[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth — sequential on left neighbour
            o = out[y]
            for x in range(stride):
                a = int(o[x - nch]) if x >= nch else 0
                b = int(prev[x])
                c = int(prev[x - nch]) if x >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                o[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad scanline filter {ft}")
    if nch == 1:
        return out.reshape(h, w)
    return out.reshape(h, w, nch)
