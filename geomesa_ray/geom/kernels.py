"""Vectorized geometry kernels (pure NumPy — no GEOS/Shapely dependency).

These replace the reference's JTS geometry operations (exact
point-in-polygon refinement inside iterators, e.g.
``geomesa-accumulo/.../iterators/SpatioTemporalIntersectingIterator.scala:23-55``)
with batch-vectorized NumPy: one call tests a whole Arrow batch of points
against one polygon, looping only over the polygon's (few) edges.

International-date-line handling mirrors
``geomesa-utils/.../geohash/GeohashUtils.scala:721-773``
(``getInternationalDateLineSafeGeometry``): out-of-range longitudes are
translated into [-180, 180] and IDL-crossing polygons are split into an
east part and a west part.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

EARTH_RADIUS_M = 6371000.0


@dataclass(frozen=True)
class Polygon:
    """Simple polygon ring (closed or open vertex list, no holes)."""

    xs: np.ndarray  # float64 [n]
    ys: np.ndarray  # float64 [n]
    bbox: tuple = field(default=None)

    def __post_init__(self):
        xs = np.asarray(self.xs, dtype=np.float64)
        ys = np.asarray(self.ys, dtype=np.float64)
        # drop an explicit closing vertex; the PIP kernel wraps implicitly
        if len(xs) > 1 and xs[0] == xs[-1] and ys[0] == ys[-1]:
            xs, ys = xs[:-1], ys[:-1]
        object.__setattr__(self, "xs", xs)
        object.__setattr__(self, "ys", ys)
        object.__setattr__(
            self, "bbox",
            (float(xs.min()), float(xs.max()), float(ys.min()), float(ys.max())),
        )


def points_in_bbox(lon, lat, lon0, lon1, lat0, lat1):
    """Inclusive-edge bbox containment, vectorized."""
    lon = np.asarray(lon)
    lat = np.asarray(lat)
    return (lon >= lon0) & (lon <= lon1) & (lat >= lat0) & (lat <= lat1)


def points_in_polygon(lon, lat, poly: Polygon) -> np.ndarray:
    """Even-odd-rule point-in-polygon test, vectorized over points.

    Loops over polygon edges (small), vectorized over the point batch
    (large). Points exactly on a horizontal edge may be classified either
    way (standard ray-cast caveat); fixture polygons avoid degenerate
    vertex alignment with data points.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x0, x1, y0, y1 = poly.bbox
    inside = np.zeros(lon.shape, dtype=bool)
    candidate = (lon >= x0) & (lon <= x1) & (lat >= y0) & (lat <= y1)
    if not candidate.any():
        return inside
    px = lon[candidate]
    py = lat[candidate]
    xs, ys = poly.xs, poly.ys
    n = len(xs)
    acc = np.zeros(px.shape, dtype=bool)
    for i in range(n):
        xa, ya = xs[i], ys[i]
        xb, yb = xs[(i + 1) % n], ys[(i + 1) % n]
        crosses = (ya > py) != (yb > py)
        if not crosses.any():
            continue
        # x coordinate where the edge crosses the horizontal through py
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = xa + (py - ya) * (xb - xa) / (yb - ya)
        acc ^= crosses & (px < xint)
    inside[candidate] = acc
    return inside


def points_in_rings(lon, lat, rings: list[Polygon]) -> np.ndarray:
    """Even-odd containment over a ring SET (shell + holes): XOR of the
    per-ring crossing parities — a point inside the shell but inside a
    hole flips back to outside. This is exactly JTS's even-odd semantics
    for polygons with interior rings (the reference accepts any such
    geometry, ``process/query/QueryProcess.scala:24-35``).

    ``rings[0]`` is the shell; its bbox prescreens the batch (holes lie
    inside the shell by construction)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if not rings:
        return np.zeros(lon.shape, dtype=bool)
    inside = points_in_polygon(lon, lat, rings[0])
    for hole in rings[1:]:
        inside ^= points_in_polygon(lon, lat, hole)
    return inside


def dist_sq_to_polyline_deg(lon, lat, xs, ys) -> np.ndarray:
    """Min squared planar distance (degrees^2) from each point to a
    polyline — vectorized over points, looping only the (few) segments.
    The corridor (buffered-LineString) containment kernel: the role of
    JTS ``geometry.buffer(d)`` in tube/corridor queries
    (``process/tube/TubeBuilder.scala:30-185``), in the planar-degree
    metric the fixture corridors use."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    best = np.full(lon.shape, np.inf)
    for i in range(len(xs) - 1):
        ax, ay = xs[i], ys[i]
        bx, by = xs[i + 1], ys[i + 1]
        dx, dy = bx - ax, by - ay
        seg_len_sq = dx * dx + dy * dy
        if seg_len_sq == 0.0:
            t = np.zeros(lon.shape)
        else:
            t = np.clip(((lon - ax) * dx + (lat - ay) * dy) / seg_len_sq,
                        0.0, 1.0)
        ex = lon - (ax + t * dx)
        ey = lat - (ay + t * dy)
        best = np.minimum(best, ex * ex + ey * ey)
    return best


def haversine_m(lon1, lat1, lon2, lat2):
    """Great-circle distance in meters, vectorized (broadcasting)."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64))
                              for a in (lon1, lat1, lon2, lat2))
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    # float rounding can push a just past 1 for near-antipodal pairs;
    # unclipped that yields NaN (silently dropped by d <= thresh filters)
    a = np.clip(a, 0.0, 1.0)
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


def planar_sq_deg(lon1, lat1, lon2, lat2):
    """Squared planar distance in degrees² — written as (dx*dx)+(dy*dy)
    with this exact operation order so the DuckDB oracle reproduces the
    identical IEEE double (used for deterministic kNN tie-breaking)."""
    dx = np.asarray(lon1, dtype=np.float64) - np.asarray(lon2, dtype=np.float64)
    dy = np.asarray(lat1, dtype=np.float64) - np.asarray(lat2, dtype=np.float64)
    return (dx * dx) + (dy * dy)


def _orient(ax, ay, bx, by, px, py):
    """Sign of the cross product (b-a) x (p-a), vectorized."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


def _on_segment(ax, ay, bx, by, px, py) -> np.ndarray:
    """p collinear with segment ab AND within its bbox (inclusive)."""
    col = _orient(ax, ay, bx, by, px, py) == 0.0
    inx = (np.minimum(ax, bx) <= px) & (px <= np.maximum(ax, bx))
    iny = (np.minimum(ay, by) <= py) & (py <= np.maximum(ay, by))
    return col & inx & iny


def _edges(rings: list[Polygon]):
    """All boundary edges of a ring set as (ax, ay, bx, by) arrays."""
    axs, ays, bxs, bys = [], [], [], []
    for r in rings:
        axs.append(r.xs)
        ays.append(r.ys)
        bxs.append(np.roll(r.xs, -1))
        bys.append(np.roll(r.ys, -1))
    return (np.concatenate(axs), np.concatenate(ays),
            np.concatenate(bxs), np.concatenate(bys))


def polygon_relate(a_rings: list[Polygon], b_rings: list[Polygon]) -> str:
    """Area-area DE-9IM named predicate for two polygons-with-holes
    (even-odd ring sets), the JTS ``geometry.relate`` role for the
    predicates the reference's filters name: ``equals`` / ``contains`` /
    ``within`` / ``overlaps`` / ``touches`` / ``disjoint``.

    Float general position is assumed for interior decisions (vertices
    not ON the other's boundary participate in interior tests; exact
    boundary contact is detected with zero-cross-product predicates) —
    the same float-exactness contract as the rest of the kernel suite.
    All edge-pair tests are one vectorized (E_A x E_B) pass."""
    aax, aay, abx, aby = _edges(a_rings)
    bax, bay, bbx, bby = _edges(b_rings)
    # (E_A, E_B) orientation signs
    o1 = _orient(aax[:, None], aay[:, None], abx[:, None], aby[:, None],
                 bax[None, :], bay[None, :])
    o2 = _orient(aax[:, None], aay[:, None], abx[:, None], aby[:, None],
                 bbx[None, :], bby[None, :])
    o3 = _orient(bax[None, :], bay[None, :], bbx[None, :], bby[None, :],
                 aax[:, None], aay[:, None])
    o4 = _orient(bax[None, :], bay[None, :], bbx[None, :], bby[None, :],
                 abx[:, None], aby[:, None])
    proper = ((np.sign(o1) * np.sign(o2) < 0)
              & (np.sign(o3) * np.sign(o4) < 0))
    if proper.any():
        return "overlaps"

    def witness(px1, py1, px2, py2):
        """Boundary WITNESS points: vertices + edge midpoints. Vertices
        alone miss interiors when every vertex lies on the other's
        boundary (grid-aligned boxes); a non-collinear edge then always
        has an off-boundary midpoint."""
        return (np.concatenate([px1, (px1 + px2) / 2.0]),
                np.concatenate([py1, (py1 + py2) / 2.0]))

    def classify(px, py, rings, oax, oay, obx, oby):
        """Per-witness position w.r.t. ``rings``: (on-boundary, strict
        interior, strict exterior) flags."""
        on = _on_segment(oax[:, None], oay[:, None], obx[:, None],
                         oby[:, None], px[None, :],
                         py[None, :]).any(axis=0)
        inside = points_in_rings(px, py, rings)
        return on, inside & ~on, ~inside & ~on

    awx, awy = witness(aax, aay, abx, aby)
    bwx, bwy = witness(bax, bay, bbx, bby)
    a_on, a_int, a_out = classify(awx, awy, b_rings, bax, bay, bbx, bby)
    b_on, b_int, b_out = classify(bwx, bwy, a_rings, aax, aay, abx, aby)

    # representation-independent equality: every witness of each
    # boundary lies ON the other boundary (extra collinear vertices are
    # immaterial; a hole ring's witnesses would fall off the boundary)
    if a_on.all() and b_on.all():
        return "equals"
    if a_int.any() and a_out.any():
        return "overlaps"  # A straddles B via shared-boundary contact
    if b_int.any() and b_out.any():
        return "overlaps"
    if a_int.any() and b_int.any():
        return "overlaps"
    if a_int.any():
        return "within"
    if b_int.any():
        return "contains"
    # no interior evidence: boundary contact decides touches/disjoint
    contact = (a_on.any() or b_on.any())
    return "touches" if contact else "disjoint"


def normalize_lon(lon):
    """Translate longitudes into [-180, 180) (GeohashUtils.scala:721-744)."""
    lon = np.asarray(lon, dtype=np.float64)
    return ((lon + 180.0) % 360.0) - 180.0


def split_idl_polygon(xs, ys) -> list[Polygon]:
    """Split a polygon whose vertices use lon > 180 (or < -180) encodings
    of an IDL crossing into separate east/west polygons in [-180, 180]
    (GeohashUtils.scala:745-773 semantics).

    Input convention: the caller supplies vertices in a continuous
    (unwrapped) longitude frame, e.g. 179 -> 181 for a crossing.
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if xs.max() <= 180.0 and xs.min() >= -180.0:
        return [Polygon(xs, ys)]
    out = []
    if (xs > 180.0).any():
        # east part clipped at 180, west part translated by -360
        out.append(_clip_lon(xs, ys, hi=180.0))
        out.append(_clip_lon(xs - 360.0, ys, lo=-180.0))
    else:
        out.append(_clip_lon(xs, ys, lo=-180.0))
        out.append(_clip_lon(xs + 360.0, ys, hi=180.0))
    return [p for p in out if p is not None]


def _clip_lon(xs, ys, lo=None, hi=None):
    """Sutherland-Hodgman clip of a polygon against a vertical line."""
    pts = list(zip(xs.tolist(), ys.tolist()))
    if pts[0] == pts[-1]:
        pts = pts[:-1]

    def inside(p):
        if lo is not None:
            return p[0] >= lo
        return p[0] <= hi

    bound = lo if lo is not None else hi
    out = []
    n = len(pts)
    for i in range(n):
        a, b = pts[i], pts[(i + 1) % n]
        ia, ib = inside(a), inside(b)
        if ia:
            out.append(a)
        if ia != ib:
            t = (bound - a[0]) / (b[0] - a[0])
            out.append((bound, a[1] + t * (b[1] - a[1])))
    if len(out) < 3:
        return None
    ox = np.array([p[0] for p in out])
    oy = np.array([p[1] for p in out])
    return Polygon(ox, oy)
