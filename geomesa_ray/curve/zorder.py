"""Vectorized Morton/Z-order bit-interleave kernels.

Semantics match the reference Z3 curve (21 bits x, 21 bits y, 20 bits t,
x in the lowest interleave position — reference
``geomesa-z3/.../curve/Z3.scala:61-90``) and a 2-D Z2 variant used for
hierarchical cell ids (the geohash / H3/S2 stand-in, reference
``geomesa-utils/.../geohash/GeoHash.scala:25-140``).

All kernels operate on ``numpy.uint64`` arrays (or scalars) and are pure
bit ops — zero-copy-friendly inside ``map_batches(batch_format="pyarrow")``.
The same AND/OR/shift chains are emitted as DuckDB SQL by
``geomesa_ray.oracle_gen`` so the driver's DuckDB oracle can reproduce
identical values.
"""

from __future__ import annotations

import numpy as np

U = np.uint64

MAX_21 = (1 << 21) - 1
MAX_20 = (1 << 20) - 1

# (shift, mask) chains for spreading 21 bits with two zero bits between
# each (3-D interleave). Constants are the standard Morton magic numbers
# for 21-bit/3-D; they reproduce the layout of reference Z3.split
# (Z3.scala:61-69) exactly.
_SPLIT3 = (
    (32, 0x1F00000000FFFF),
    (16, 0x1F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
)

# 2-D interleave (one zero bit between each), supports up to 32 input bits.
_SPLIT2 = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def split21(x):
    """Spread the low 21 bits of ``x`` so bit i lands at position 3*i."""
    x = np.asarray(x, dtype=U) & U(MAX_21)
    for shift, mask in _SPLIT3:
        x = (x | (x << U(shift))) & U(mask)
    return x


def combine21(z):
    """Inverse of :func:`split21` — gather every 3rd bit (Z3.scala:72-79)."""
    x = np.asarray(z, dtype=U) & U(0x1249249249249249)
    for shift, mask in reversed(_SPLIT3):
        x = (x ^ (x >> U(shift))) & U(_prev_mask3(mask))
    return x


def _prev_mask3(mask):
    # Masks walk back up the chain; the final gather mask is MAX_21.
    chain = [m for _, m in _SPLIT3]
    i = chain.index(mask)
    return MAX_21 if i == 0 else chain[i - 1]


def split32(x):
    """Spread low 32 bits of ``x`` so bit i lands at position 2*i."""
    x = np.asarray(x, dtype=U) & U(0xFFFFFFFF)
    for shift, mask in _SPLIT2:
        x = (x | (x << U(shift))) & U(mask)
    return x


def combine32(z):
    """Inverse of :func:`split32` — gather every 2nd bit."""
    x = np.asarray(z, dtype=U) & U(0x5555555555555555)
    chain = [m for _, m in _SPLIT2]
    for idx in range(len(_SPLIT2) - 1, -1, -1):
        shift = _SPLIT2[idx][0]
        prev = 0xFFFFFFFF if idx == 0 else chain[idx - 1]
        x = (x ^ (x >> U(shift))) & U(prev)
    return x


def z3_encode(x, y, t):
    """(x:21b, y:21b, t:20b) -> 63-bit Z3 value (Z3.scala:86-88)."""
    return split21(x) | (split21(y) << U(1)) | (split21(t) << U(2))


def z3_decode(z):
    """Z3 value -> (x, y, t) as uint64 arrays (Z3.scala:21-29)."""
    z = np.asarray(z, dtype=U)
    return combine21(z), combine21(z >> U(1)), combine21(z >> U(2))


def z2_encode(ix, iy):
    """(ix, iy) -> 2-D Morton code (one zero bit interleave)."""
    return split32(ix) | (split32(iy) << U(1))


def z2_decode(z):
    z = np.asarray(z, dtype=U)
    return combine32(z), combine32(z >> U(1))


def _load_same_dim(target: int, p: int, set_one: bool, dims: int) -> int:
    """Set bit p of ``target`` and force all LOWER bits of the same
    dimension (positions p-dims, p-2*dims, ...) to zeros (``set_one``)
    or set bit p to 0 and the same-dim lower bits to ones."""
    below = 0
    q = p - dims
    while q >= 0:
        below |= 1 << q
        q -= dims
    if set_one:
        return (target | (1 << p)) & ~below
    return (target & ~(1 << p)) | below


def zdiv(zval: int, rmin: int, rmax: int, dims: int = 3,
         total_bits: int = 63) -> tuple[int | None, int | None]:
    """On-the-fly Tropf LITMAX/BIGMIN (reference ``Z3.scala:181-232``
    ``zdiv``): given a seek value ``zval`` that fell outside the query
    box, and the box's Morton corner codes ``[rmin, rmax]``, return
    ``(litmax, bigmin)`` — the largest in-box z-address < zval and the
    smallest in-box z-address > zval (either may be None).

    The engine's scans normally use plan-time merged ranges +
    :func:`seek_skip` (equivalent, and cheaper when ranges are already
    enumerated); zdiv is the unbounded-range path the reference uses
    inside tablet iterators, kept for parity and for queries whose range
    decomposition was truncated (recursion budget exhausted).
    """
    litmax = bigmin = None
    for p in range(total_bits - 1, -1, -1):
        zb = (zval >> p) & 1
        ab = (rmin >> p) & 1
        bb = (rmax >> p) & 1
        if (zb, ab, bb) in ((0, 0, 0), (1, 1, 1)):
            continue
        if (zb, ab, bb) == (0, 0, 1):
            bigmin = _load_same_dim(rmin, p, True, dims)
            rmax = _load_same_dim(rmax, p, False, dims)
        elif (zb, ab, bb) == (0, 1, 1):
            return litmax, rmin
        elif (zb, ab, bb) == (1, 0, 0):
            return rmax, bigmin
        elif (zb, ab, bb) == (1, 0, 1):
            litmax = _load_same_dim(rmax, p, False, dims)
            rmin = _load_same_dim(rmin, p, True, dims)
        else:  # (0,1,0) / (1,1,0): rmin > rmax in this prefix
            raise ValueError("invalid z-range: rmin > rmax")
    # all bits agreed: zval itself lies inside the box
    return litmax, bigmin


def seek_skip(ranges_lo: np.ndarray, ranges_hi: np.ndarray, z: int) -> int | None:
    """Next z at-or-after ``z`` inside the covering range list, or None.

    Fulfils the role of the reference's Tropf LITMAX/BIGMIN seek-skipping
    (``Z3.scala:181-232`` ``zdiv``): the reference computes BIGMIN on the
    fly because it cannot enumerate ranges exhaustively per tablet; this
    engine precomputes merged covering ranges at plan time (zranges +
    MergeQueue), so the provably-equivalent skip is a binary search over
    that list. Used when seeking within (week, z3)-sorted partitions.
    """
    i = int(np.searchsorted(ranges_hi, z))
    if i >= len(ranges_lo):
        return None
    return max(z, int(ranges_lo[i]))
