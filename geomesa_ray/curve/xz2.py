"""XZ2-style extent index: space-filling-curve keys for NON-POINT
geometries (boxes / polygon envelopes as DATA, not just queries).

Reference parity: GeoMesa's XZ2 index (``geomesa-z3`` XZ2SFC, after
Böhm et al.'s XZ-ordering) keys each geometry by the finest quad cell
whose ENLARGED extent (the cell doubled in width and height) contains
the geometry's envelope, anchored at the envelope's lower-left cell.
Queries enumerate, per level, the anchor cells whose enlarged extent
can intersect the query window — a superset guarantee that makes the
index PRUNING-ONLY (the exact envelope-overlap refine keeps
correctness; the driver's SQL oracle is a plain interval-overlap join,
so any lost candidate fails the hash gate).

All kernels are vectorized numpy; query planning is a driver-side
per-level ``zranges_2d`` call (same octree machinery as the point
index).
"""

from __future__ import annotations

import numpy as np

from geomesa_ray.curve.sfc import lonlat_to_xy, merge_ranges, zranges_2d
from geomesa_ray.curve.zorder import z2_encode

MAX_XZ2_LEVEL = 12


def xz2_level(width: np.ndarray, height: np.ndarray,
              max_level: int = MAX_XZ2_LEVEL) -> np.ndarray:
    """Finest level whose cell size covers the extent: an envelope with
    w <= 360/2^l and h <= 180/2^l, anchored at its lower-left cell,
    always fits inside that cell's 2x-enlarged extent."""
    width = np.maximum(np.asarray(width, dtype=np.float64), 1e-12)
    height = np.maximum(np.asarray(height, dtype=np.float64), 1e-12)
    lw = np.floor(np.log2(360.0 / width))
    lh = np.floor(np.log2(180.0 / height))
    return np.clip(np.minimum(lw, lh), 0, max_level).astype(np.int64)


def xz2_encode(lon_min, lon_max, lat_min, lat_max,
               max_level: int = MAX_XZ2_LEVEL):
    """Envelopes -> (level, anchor z2 cell) keys, vectorized. The anchor
    is the cell containing the (clamped) lower-left corner; clamping is
    safe because only the in-world part of an envelope can match a
    query, and that part always lies inside the clamped anchor's
    enlarged extent."""
    lon_min = np.asarray(lon_min, dtype=np.float64)
    lat_min = np.asarray(lat_min, dtype=np.float64)
    w = np.asarray(lon_max, dtype=np.float64) - lon_min
    h = np.asarray(lat_max, dtype=np.float64) - lat_min
    level = xz2_level(w, h, max_level)
    cell = np.zeros(len(level), dtype=np.int64)
    for lv in np.unique(level):
        m = level == lv
        ix, iy = lonlat_to_xy(np.clip(lon_min[m], -180.0, 180.0),
                              np.clip(lat_min[m], -90.0, 90.0),
                              int(lv), int(lv))
        cell[m] = z2_encode(ix.astype(np.uint64),
                            iy.astype(np.uint64)).view(np.int64)
    return level, cell


def xz2_query_ranges(lon0: float, lon1: float, lat0: float, lat1: float,
                     max_level: int = MAX_XZ2_LEVEL) -> dict:
    """Per-level merged (lo, hi) anchor-cell ranges whose ENLARGED cell
    can intersect the query window: the anchor box expanded one cell
    left and down (enlarged cells extend 2 cells right/up from their
    anchor)."""
    out = {}
    for lv in range(max_level + 1):
        n = 1 << lv
        sw = 360.0 / n
        sh = 180.0 / n
        ix0, iy0 = lonlat_to_xy(max(lon0 - sw, -180.0),
                                max(lat0 - sh, -90.0), lv, lv)
        ix1, iy1 = lonlat_to_xy(min(lon1, 180.0 - 1e-12),
                                min(lat1, 90.0 - 1e-12), lv, lv)
        ranges = merge_ranges(
            zranges_2d(int(ix0), int(ix1), int(iy0), int(iy1), lv))
        # pre-built arrays: the plan is probed by every map_batches call
        out[lv] = (np.array([r[0] for r in ranges], dtype=np.int64),
                   np.array([r[1] for r in ranges], dtype=np.int64))
    return out


def xz2_candidate_mask(level: np.ndarray, cell: np.ndarray,
                       ranges_by_level: dict) -> np.ndarray:
    """Vectorized membership of (level, cell) keys in the per-level
    query ranges (searchsorted per level present in the batch)."""
    keep = np.zeros(len(level), dtype=bool)
    for lv in np.unique(level):
        rngs = ranges_by_level.get(int(lv))
        if rngs is None or len(rngs[0]) == 0:
            continue
        los, his = rngs
        m = level == lv
        c = cell[m]
        idx = np.searchsorted(los, c, side="right") - 1
        ok = (idx >= 0) & (c <= his[np.clip(idx, 0, len(his) - 1)])
        keep[m] = ok
    return keep
