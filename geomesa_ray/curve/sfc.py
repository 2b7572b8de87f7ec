"""Space-filling-curve coordinate normalization + query range planning.

Reference parity:
- Normalization of lon/lat/seconds-in-week to 21/21/20-bit curve coords:
  ``geomesa-z3/.../curve/SpaceFillingCurve.scala:12-44`` (NormalizedLon /
  NormalizedLat / NormalizedTime with 1-week tmax).
- Week-epoch math: ``geomesa-accumulo/.../data/tables/Z3Table.scala:48-51``
  (epochWeeks / secondsInCurrentWeek counted from the unix epoch).
- Query range decomposition: ``Z3.scala:111-154`` (``zranges`` octree
  recursion, bounded depth) + ``MergeQueue.scala:64-127`` (sorted
  overlap/adjacency coalescing).

Planner functions run DRIVER-SIDE at plan time (pure Python, tiny inputs);
the per-row encode kernels are vectorized NumPy used inside
``map_batches``. Ranges produced here may OVER-cover the query box (a
superset) — the pipeline always applies an exact refine filter after the
coarse z-range prune, so over-coverage affects efficiency only, never
correctness (mirrors the reference's coarse-iterator + exact-filter split,
``iterators/Z3Iterator.scala:55-70``).

IMPORTANT: the float expressions in ``lonlat_to_xy`` are written with the
exact same operation order as the generated DuckDB oracle SQL
(``geomesa_ray/oracle_gen.py``) so both sides produce bit-identical IEEE
doubles and therefore identical integer curve coordinates.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from geomesa_ray.curve.zorder import U, z2_encode, z3_encode

SECONDS_PER_WEEK = 604800
XBITS = 21
YBITS = 21
TBITS = 20


def lonlat_to_xy(lon, lat, bits_x: int = XBITS, bits_y: int = YBITS):
    """Normalize lon∈[-180,180], lat∈[-90,90] to integer curve coords.

    floor((lon+180)/360 * 2^bits), clamped to [0, 2^bits-1]. Same formula
    text is emitted for the SQL oracle — do not reorder operations.
    """
    nx = np.int64(1) << np.int64(bits_x)
    ny = np.int64(1) << np.int64(bits_y)
    ix = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * float(nx))
    iy = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * float(ny))
    ix = np.clip(ix, 0, float(nx - 1)).astype(np.int64)
    iy = np.clip(iy, 0, float(ny - 1)).astype(np.int64)
    return ix, iy


def time_to_week_t(epoch_seconds):
    """Unix seconds -> (week:int64, it:int64 20-bit time-in-week coord).

    week = secs // 604800; it = (secs_in_week * 2^20) // 604800 —
    integer arithmetic, exactly reproducible in SQL.
    (Z3Table.scala:48-51 + NormalizedTime with tmax = 1 week.)
    """
    secs = np.asarray(epoch_seconds, dtype=np.int64)
    week = secs // np.int64(SECONDS_PER_WEEK)
    tin = secs - week * np.int64(SECONDS_PER_WEEK)
    it = (tin * np.int64(1 << TBITS)) // np.int64(SECONDS_PER_WEEK)
    return week, it


@dataclass(frozen=True)
class Z3SFC:
    """Z3 space-time curve: (lon, lat, unix-seconds) -> (week, z3)."""

    def index(self, lon, lat, epoch_seconds):
        ix, iy = lonlat_to_xy(lon, lat)
        week, it = time_to_week_t(epoch_seconds)
        z3 = z3_encode(ix.view(U), iy.view(U), it.view(U))
        return week, z3.view(np.int64)


@dataclass(frozen=True)
class Z2Grid:
    """Hierarchical 2-D cell grid (H3/S2 stand-in): level-L Morton cells.

    cell(level) = z2_encode(floor-scaled lon/lat at 2^level per axis).
    A level-L cell id right-shifted by 2*(L-K) is its ancestor at level K —
    the prefix-hierarchy property GeoMesa gets from geohash prefixes
    (GeoHash.scala:25-140).
    """

    level: int = 12

    def encode(self, lon, lat):
        ix, iy = lonlat_to_xy(lon, lat, self.level, self.level)
        return z2_encode(ix.view(U), iy.view(U)).view(np.int64)

    def cell_bounds(self, cell):
        """cell id -> (lon0, lon1, lat0, lat1) of the cell rectangle."""
        from geomesa_ray.curve.zorder import z2_decode

        ix, iy = z2_decode(np.asarray(cell, dtype=np.int64).view(U))
        n = float(1 << self.level)
        lon0 = ix.astype(np.float64) / n * 360.0 - 180.0
        lat0 = iy.astype(np.float64) / n * 180.0 - 90.0
        return lon0, lon0 + 360.0 / n, lat0, lat0 + 180.0 / n

    def bbox_cells(self, lon0, lon1, lat0, lat1):
        """All level-`level` cells overlapping the bbox (inclusive edges)."""
        ix0, iy0 = lonlat_to_xy(lon0, lat0, self.level, self.level)
        ix1, iy1 = lonlat_to_xy(lon1, lat1, self.level, self.level)
        xs = np.arange(int(ix0), int(ix1) + 1, dtype=np.int64)
        ys = np.arange(int(iy0), int(iy1) + 1, dtype=np.int64)
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        return z2_encode(gx.ravel().view(U), gy.ravel().view(U)).view(np.int64)


def merge_ranges(ranges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Sort + coalesce overlapping/adjacent (lo, hi) inclusive ranges.

    Reference ``MergeQueue.scala:64-127`` does this incrementally; a
    plan-time sort+sweep is equivalent.
    """
    if not ranges:
        return []
    ranges = sorted(ranges)
    out = [ranges[0]]
    for lo, hi in ranges[1:]:
        plo, phi = out[-1]
        if lo <= phi + 1:
            if hi > phi:
                out[-1] = (plo, hi)
        else:
            out.append((lo, hi))
    return out


MAX_RANGES = 512


def _zranges(dims: int, maxes: tuple[int, ...], encode, box_lo, box_hi,
             max_level: int, total_bits: int,
             max_ranges: int = MAX_RANGES) -> list[tuple[int, int]]:
    """Generic bounded-depth quad/octree decomposition of an axis-aligned
    integer box into covering Z-ranges (semantics of Z3.zranges,
    Z3.scala:111-154: recurse while a cell straddles the box, emit covering
    ranges for cells fully inside or at the recursion budget). Emission is
    additionally capped at ``max_ranges`` raw ranges — past the cap,
    straddling cells emit their whole covering range (over-coverage, which
    the exact refine filter absorbs)."""
    out: list[tuple[int, int]] = []

    def cell_fully_inside(lo_coords, hi_coords):
        return all(box_lo[d] <= lo_coords[d] and hi_coords[d] <= box_hi[d] for d in range(dims))

    def cell_disjoint(lo_coords, hi_coords):
        return any(hi_coords[d] < box_lo[d] or lo_coords[d] > box_hi[d] for d in range(dims))

    def recurse(level, coords):
        # coords are the cell's min corner in units of the cell size at
        # this level; cell spans [c*size, (c+1)*size - 1] per dim.
        shift = [max(b - level, 0) for b in _dim_bits(dims, total_bits)]
        size = [1 << s for s in shift]
        lo_coords = [coords[d] * size[d] for d in range(dims)]
        hi_coords = [min(lo_coords[d] + size[d] - 1, maxes[d]) for d in range(dims)]
        if cell_disjoint(lo_coords, hi_coords):
            return
        if (cell_fully_inside(lo_coords, hi_coords) or level >= max_level
                or len(out) >= max_ranges):
            zlo = int(encode(*lo_coords))
            # max z in cell = encode of max corner (works because the cell
            # is a complete aligned sub-cube of the curve)
            zhi = int(encode(*hi_coords))
            out.append((zlo, zhi))
            return
        for child in range(1 << dims):
            recurse(level + 1, tuple(coords[d] * 2 + ((child >> d) & 1) for d in range(dims)))

    recurse(0, (0,) * dims)
    return merge_ranges(out)


def _dim_bits(dims, total_bits):
    return [total_bits] * dims


def _common_level(lo: tuple, hi: tuple, total_bits: int) -> int:
    """Level of the smallest aligned curve cell containing the whole box
    (the reference recurses from the common prefix of zmin/zmax,
    Z3.scala:111-120, so the depth budget is relative, not absolute)."""
    level = total_bits
    for d in range(len(lo)):
        x = int(lo[d]) ^ int(hi[d])
        level = min(level, total_bits - x.bit_length())
    return max(level, 0)


def zranges_3d(ix0, ix1, iy0, iy1, it0, it1, depth_budget: int = 7) -> list[tuple[int, int]]:
    """Covering Z3 ranges for an integer box in (x, y, t) curve coords.

    ``depth_budget`` bounds octree recursion below the box's common-prefix
    cell (reference budget 5-7 levels, Z3.scala:115); deeper boxes
    over-cover, which the exact refine filter absorbs.
    """
    maxes = ((1 << XBITS) - 1, (1 << YBITS) - 1, (1 << TBITS) - 1)

    def enc(x, y, t):
        return int(z3_encode(np.uint64(x), np.uint64(y), np.uint64(min(t, maxes[2]))))

    lo, hi = (ix0, iy0, it0), (ix1, iy1, it1)
    max_level = min(XBITS, _common_level(lo, hi, XBITS) + depth_budget)
    return _zranges(3, maxes, enc, lo, hi, max_level, XBITS)


def zranges_2d(ix0, ix1, iy0, iy1, level: int, depth_budget: int = 8) -> list[tuple[int, int]]:
    """Covering Z2 ranges for an integer box at a given grid level."""
    maxes = ((1 << level) - 1, (1 << level) - 1)

    def enc(x, y):
        return int(z2_encode(np.uint64(x), np.uint64(y)))

    lo, hi = (ix0, iy0), (ix1, iy1)
    max_level = min(level, _common_level(lo, hi, level) + depth_budget)
    return _zranges(2, maxes, enc, lo, hi, max_level, level)
