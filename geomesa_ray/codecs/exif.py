"""EXIF GPS metadata: pure-struct APP1 (TIFF/IFD) reader and writer.

Reference parity: the blobstore's EXIF handler derives a blob's
geometry from the image file itself via the GPS directory
(``geomesa-blobstore-exif-handler/.../MetadataFileHandler.scala:24-45``
reads GPSLatitude/GPSLongitude through com.drew ImageMetadataReader; its
date extraction is an upstream TODO — implemented here via
DateTimeOriginal). No imaging library exists in this sandbox, so the
EXIF TIFF structure (CIPA DC-008 / TIFF 6.0) is parsed directly:
APP1 "Exif\\0\\0" -> TIFF header (II/MM byte order) -> IFD0 ->
GPS IFD (tag 0x8825) + Exif IFD (tag 0x8769).

The writer emits a minimal well-formed APP1 so tests (and corpus
synthesis) can stamp coordinates into JPEGs this repo encodes; the
reader handles BOTH byte orders and out-of-line rational values, the
layout every real camera writes.
"""

from __future__ import annotations

import struct
from datetime import datetime, timezone

# TIFF types
_ASCII, _RATIONAL = 2, 5
_TAG_EXIF_IFD = 0x8769
_TAG_GPS_IFD = 0x8825
_TAG_GPS_LAT_REF, _TAG_GPS_LAT = 0x0001, 0x0002
_TAG_GPS_LON_REF, _TAG_GPS_LON = 0x0003, 0x0004
_TAG_DATETIME_ORIGINAL = 0x9003


def _dms(value: float) -> list[tuple[int, int]]:
    """abs(decimal degrees) -> [(d,1),(m,1),(s*1e6,1e6)] rationals."""
    v = abs(value)
    d = int(v)
    m = int((v - d) * 60)
    s = round(((v - d) * 60 - m) * 60 * 1_000_000)
    if s >= 60 * 1_000_000:  # carry from rounding
        s -= 60 * 1_000_000
        m += 1
    if m >= 60:
        m -= 60
        d += 1
    return [(d, 1), (m, 1), (s, 1_000_000)]


def build_exif_app1(lat: float, lon: float, dtg_s: int | None = None,
                    big_endian: bool = False) -> bytes:
    """A minimal APP1 Exif segment (marker + length + payload) carrying
    GPS lat/lon and optionally DateTimeOriginal."""
    bo = ">" if big_endian else "<"

    def u16(v):
        return struct.pack(bo + "H", v)

    def u32(v):
        return struct.pack(bo + "I", v)

    def entry(tag, typ, count, payload):
        return u16(tag) + u16(typ) + u32(count) + payload

    # layout: TIFF header (8) | IFD0 | GPS IFD | [Exif IFD] | data area
    n_ifd0 = 1 + (1 if dtg_s is not None else 0)
    ifd0_off = 8
    gps_off = ifd0_off + 2 + 12 * n_ifd0 + 4
    gps_entries = 4
    exif_off = gps_off + 2 + 12 * gps_entries + 4
    n_exif = 1 if dtg_s is not None else 0
    data_off = exif_off + (2 + 12 * n_exif + 4 if n_exif else 0)

    data = bytearray()

    def rat3(dms):
        off = data_off + len(data)
        for num, den in dms:
            data.extend(u32(num) + u32(den))
        return u32(off)

    lat_ref = (b"N" if lat >= 0 else b"S") + b"\0\0\0"
    lon_ref = (b"E" if lon >= 0 else b"W") + b"\0\0\0"
    gps = u16(gps_entries)
    gps += entry(_TAG_GPS_LAT_REF, _ASCII, 2, lat_ref)
    gps += entry(_TAG_GPS_LAT, _RATIONAL, 3, rat3(_dms(lat)))
    gps += entry(_TAG_GPS_LON_REF, _ASCII, 2, lon_ref)
    gps += entry(_TAG_GPS_LON, _RATIONAL, 3, rat3(_dms(lon)))
    gps += u32(0)  # next IFD

    exif_ifd = b""
    if dtg_s is not None:
        ts = datetime.fromtimestamp(dtg_s, tz=timezone.utc)
        s = ts.strftime("%Y:%m:%d %H:%M:%S").encode() + b"\0"
        off = data_off + len(data)
        data.extend(s)
        exif_ifd = u16(1) + entry(_TAG_DATETIME_ORIGINAL, _ASCII,
                                  len(s), u32(off)) + u32(0)

    ifd0 = u16(n_ifd0)
    if dtg_s is not None:
        ifd0 += entry(_TAG_EXIF_IFD, 4, 1, u32(exif_off))
    ifd0 += entry(_TAG_GPS_IFD, 4, 1, u32(gps_off))
    ifd0 += u32(0)

    tiff = (b"MM" if big_endian else b"II") + u16(42) + u32(ifd0_off) \
        + ifd0 + gps + exif_ifd + bytes(data)
    payload = b"Exif\0\0" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_exif(jpeg: bytes, lat: float, lon: float,
                dtg_s: int | None = None,
                big_endian: bool = False) -> bytes:
    """Splice a GPS APP1 right after SOI (where cameras put it)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    return jpeg[:2] + build_exif_app1(lat, lon, dtg_s, big_endian) \
        + jpeg[2:]


def _walk_ifd(tiff: bytes, bo: str, off: int) -> dict[int, tuple]:
    """IFD entries at ``off``: tag -> (type, count, value_or_offset
    field bytes)."""
    (n,) = struct.unpack_from(bo + "H", tiff, off)
    out = {}
    for i in range(n):
        e = off + 2 + 12 * i
        tag, typ = struct.unpack_from(bo + "HH", tiff, e)
        (count,) = struct.unpack_from(bo + "I", tiff, e + 4)
        out[tag] = (typ, count, tiff[e + 8:e + 12])
    return out


def _rationals(tiff: bytes, bo: str, count: int, field: bytes) -> list:
    (off,) = struct.unpack(bo + "I", field)
    vals = []
    for i in range(count):
        num, den = struct.unpack_from(bo + "II", tiff, off + 8 * i)
        vals.append(num / den if den else 0.0)
    return vals


def _ascii(tiff: bytes, bo: str, count: int, field: bytes) -> str:
    if count <= 4:
        raw = field[:count]
    else:
        (off,) = struct.unpack(bo + "I", field)
        raw = tiff[off:off + count]
    return raw.split(b"\0")[0].decode("ascii", "replace")


def read_exif_gps(jpeg: bytes) -> dict | None:
    """GPS (+ DateTimeOriginal) from a JPEG's APP1 Exif segment:
    ``{"lat": .., "lon": .., "dtg_s": ..?}`` or None when the file has
    no GPS directory — OR a truncated/malformed one (a damaged camera
    file must map to the handler's canProcess=False skip contract, not
    crash a whole ingest batch)."""
    try:
        return _read_exif_gps(jpeg)
    except (struct.error, IndexError, ZeroDivisionError):
        return None


def _read_exif_gps(jpeg: bytes) -> dict | None:
    if jpeg[:2] != b"\xff\xd8":
        return None
    pos = 2
    n = len(jpeg)
    tiff = None
    while pos + 4 <= n and jpeg[pos] == 0xFF:
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (length,) = struct.unpack_from(">H", jpeg, pos + 2)
        if marker == 0xE1 and jpeg[pos + 4:pos + 10] == b"Exif\0\0":
            tiff = jpeg[pos + 10:pos + 2 + length]
            break
        if marker == 0xDA:
            break  # entropy data: no EXIF past here
        pos += 2 + length
    if tiff is None or len(tiff) < 8:
        return None
    if tiff[:2] == b"II":
        bo = "<"
    elif tiff[:2] == b"MM":
        bo = ">"
    else:
        return None
    (ifd0_off,) = struct.unpack_from(bo + "I", tiff, 4)
    ifd0 = _walk_ifd(tiff, bo, ifd0_off)
    if _TAG_GPS_IFD not in ifd0:
        return None
    (gps_off,) = struct.unpack(bo + "I", ifd0[_TAG_GPS_IFD][2])
    gps = _walk_ifd(tiff, bo, gps_off)
    if _TAG_GPS_LAT not in gps or _TAG_GPS_LON not in gps:
        return None
    d, m, s = _rationals(tiff, bo, 3, gps[_TAG_GPS_LAT][2])
    lat = d + m / 60.0 + s / 3600.0
    if _ascii(tiff, bo, *gps[_TAG_GPS_LAT_REF][1:]).upper() \
            .startswith("S"):
        lat = -lat
    d, m, s = _rationals(tiff, bo, 3, gps[_TAG_GPS_LON][2])
    lon = d + m / 60.0 + s / 3600.0
    if _ascii(tiff, bo, *gps[_TAG_GPS_LON_REF][1:]).upper() \
            .startswith("W"):
        lon = -lon
    out = {"lat": lat, "lon": lon}
    if _TAG_EXIF_IFD in ifd0:
        (eoff,) = struct.unpack(bo + "I", ifd0[_TAG_EXIF_IFD][2])
        exif = _walk_ifd(tiff, bo, eoff)
        if _TAG_DATETIME_ORIGINAL in exif:
            txt = _ascii(tiff, bo, *exif[_TAG_DATETIME_ORIGINAL][1:])
            try:
                ts = datetime.strptime(txt, "%Y:%m:%d %H:%M:%S") \
                    .replace(tzinfo=timezone.utc)
                out["dtg_s"] = int(ts.timestamp())
            except ValueError:
                pass  # malformed date: geometry still usable
    return out
