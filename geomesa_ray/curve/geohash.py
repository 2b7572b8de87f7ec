"""Standard base32 GeoHash — byte-format-compatible encode/decode.

Reference parity: ``geomesa-utils/.../geohash/GeoHash.scala:25-140``
implements the canonical GeoHash (Niemeyer) bit layout — alternating
lon/lat bits starting with LONGITUDE at the most-significant position,
grouped 5 bits per character of the base32 alphabet
``0123456789bcdefghjkmnpqrstuvwxyz`` — and uses the resulting strings as
hierarchical ST-index key prefixes. The engine's native 2-D cell is the
Z2 Morton id (``curve/sfc.Z2Grid``); this module provides the
WIRE-compatible GeoHash string for interop with reference-written keys
and external geo tooling.

Bit layout for ``precision`` characters: nbits = 5 * precision,
n_lon = ceil(nbits / 2) lon bits, n_lat = floor(nbits / 2) lat bits,
interleaved lon-first from the MSB. Equivalently (used here, and
mirrored bit-for-bit in DuckDB SQL by ``oracle_gen.geohash_sql``):

* odd  nbits: lon bits sit at EVEN positions (LSB included) —
  ``code = split(x) | (split(y) << 1)``
* even nbits: lon bits sit at ODD positions —
  ``code = (split(x) << 1) | split(y)``

where ``split`` is the standard 2-D Morton spread (one zero bit between
each input bit) and x/y are the floor-scaled integer lon/lat coordinates
at n_lon/n_lat bits. All kernels are vectorized numpy over uint64;
precision <= 12 (60 bits) keeps every value int64-safe for Arrow/SQL.
"""

from __future__ import annotations

import numpy as np

from geomesa_ray.curve.zorder import combine32, split32

U = np.uint64

ALPHABET = b"0123456789bcdefghjkmnpqrstuvwxyz"
_ALPHA_ARR = np.frombuffer(ALPHABET, dtype=np.uint8)
# 256-entry inverse LUT: byte -> 5-bit value (255 = invalid)
_INV = np.full(256, 255, dtype=np.uint8)
_INV[_ALPHA_ARR] = np.arange(32, dtype=np.uint8)

MAX_PRECISION = 12  # 60 bits — int64-safe end to end


def _bits(precision: int) -> tuple[int, int, int]:
    if not 1 <= precision <= MAX_PRECISION:
        raise ValueError(f"precision must be 1..{MAX_PRECISION}: {precision}")
    nbits = 5 * precision
    return nbits, (nbits + 1) // 2, nbits // 2


def _scale(vals: np.ndarray, offset: float, extent: float,
           bits: int) -> np.ndarray:
    n = 1 << bits
    ix = np.floor((np.asarray(vals, dtype=np.float64) + offset)
                  / extent * n).astype(np.int64)
    return np.clip(ix, 0, n - 1).astype(U)


def geohash_int(lon, lat, precision: int = 9) -> np.ndarray:
    """The geohash as its nbits-wide integer code (int64) — the exact
    bit string the base32 characters group, useful as a sort/prune key
    with the same prefix-containment property as the string."""
    nbits, n_lon, n_lat = _bits(precision)
    x = _scale(lon, 180.0, 360.0, n_lon)
    y = _scale(lat, 90.0, 180.0, n_lat)
    sx, sy = split32(x), split32(y)
    if nbits % 2:  # odd: lon at even positions
        code = sx | (sy << U(1))
    else:  # even: lon at odd positions
        code = (sx << U(1)) | sy
    return code.astype(np.int64)


def geohash_encode(lon, lat, precision: int = 9) -> np.ndarray:
    """Vectorized canonical GeoHash strings (numpy unicode array)."""
    code = geohash_int(lon, lat, precision).view(U)
    n = len(code)
    chars = np.empty((n, precision), dtype=np.uint8)
    for c in range(precision):
        shift = U(5 * (precision - 1 - c))
        chars[:, c] = _ALPHA_ARR[(code >> shift) & U(31)]
    return chars.view(f"S{precision}").ravel().astype(f"U{precision}")


def geohash_decode_int(hashes) -> tuple[np.ndarray, int]:
    """(int64 codes, precision) from equal-length geohash strings."""
    arr = np.asarray(hashes)
    if arr.dtype.kind == "U":
        precision = arr.dtype.itemsize // 4
        b = arr.astype(f"S{precision}")
    elif arr.dtype.kind == "S":
        precision = arr.dtype.itemsize
        b = arr
    else:
        raise TypeError(f"expected a string array, got {arr.dtype}")
    if not 1 <= precision <= MAX_PRECISION:
        raise ValueError(f"geohash length must be 1..{MAX_PRECISION}: "
                         f"{precision}")
    raw = np.frombuffer(b.tobytes(), dtype=np.uint8).reshape(-1, precision)
    vals = _INV[raw]
    if (vals == 255).any():
        bad = raw[(vals == 255).any(axis=1)][0].tobytes().decode(
            "ascii", "replace")
        raise ValueError(f"invalid geohash character in {bad!r}")
    code = np.zeros(len(raw), dtype=U)
    for c in range(precision):
        code = (code << U(5)) | vals[:, c].astype(U)
    return code.astype(np.int64), precision


def geohash_bounds(hashes) -> dict[str, np.ndarray]:
    """Exact cell bounds (lon_min/lon_max/lat_min/lat_max) of each
    geohash — the decode surface (GeoHash.scala exposes the bounding
    box; the conventional 'decoded point' is the box center)."""
    code, precision = geohash_decode_int(hashes)
    nbits, n_lon, n_lat = _bits(precision)
    code = code.view(U)
    if nbits % 2:
        x = combine32(code)
        y = combine32(code >> U(1))
    else:
        x = combine32(code >> U(1))
        y = combine32(code)
    wx = 360.0 / (1 << n_lon)
    wy = 180.0 / (1 << n_lat)
    lon_min = x.astype(np.float64) * wx - 180.0
    lat_min = y.astype(np.float64) * wy - 90.0
    return {"lon_min": lon_min, "lon_max": lon_min + wx,
            "lat_min": lat_min, "lat_max": lat_min + wy}


def geohash_decode(hashes) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) cell centers — the canonical decoded point."""
    b = geohash_bounds(hashes)
    return ((b["lon_min"] + b["lon_max"]) / 2.0,
            (b["lat_min"] + b["lat_max"]) / 2.0)
