"""CQL (ECQL) query-string parsing onto the engine's planner.

Reference parity: GeoMesa users express queries as (E)CQL strings parsed
by GeoTools into Filter trees that the query planner splits into a
coarse index scan + exact refinement (``QueryFilterSplitter.scala``,
``org.geotools.filter.text.ecql.ECQL`` call sites across the query
modules). This module parses the subset that maps onto the engine's
predicate surface:

- ``BBOX(geom, minx, miny, maxx, maxy)``
- ``dtg DURING <iso>/<iso>``, ``dtg AFTER <iso>``, ``dtg BEFORE <iso>``
- ``<attr> IN ('a', 'b', ...)`` and ``<attr> = 'value'``
- ``INTERSECTS(geom, <POLYGON|MULTIPOLYGON|LINESTRING WKT>)``
- ``DWITHIN(geom, POINT(x y), <dist>, meters)``
- top-level ``AND`` conjunctions of the above

The result is a :class:`CqlQuery` carrying a planner ``QuerySpec`` plus
the geometry/DWithin predicates that dispatch to the join pipelines —
``GeoMesaRayEngine.cql(expr)`` executes it end to end.

Timestamps are ISO-8601 UTC (trailing Z optional), parsed with
``calendar.timegm`` (naive-UTC convention used throughout the engine).
"""

from __future__ import annotations

import calendar
import re
import time as _time
from dataclasses import dataclass, field

from geomesa_ray.planner import QuerySpec

_BBOX_RE = re.compile(
    r"^BBOX\s*\(\s*geom\s*,\s*([-\d.eE+]+)\s*,\s*([-\d.eE+]+)\s*,"
    r"\s*([-\d.eE+]+)\s*,\s*([-\d.eE+]+)\s*\)$", re.IGNORECASE)
_DURING_RE = re.compile(
    r"^dtg\s+DURING\s+(\S+)\s*/\s*(\S+)$", re.IGNORECASE)
_AFTER_RE = re.compile(r"^dtg\s+AFTER\s+(\S+)$", re.IGNORECASE)
_BEFORE_RE = re.compile(r"^dtg\s+BEFORE\s+(\S+)$", re.IGNORECASE)
_IN_RE = re.compile(r"^(\w+)\s+IN\s*\(\s*(.*)\s*\)$",
                    re.IGNORECASE | re.DOTALL)
_EQ_RE = re.compile(r"^(\w+)\s*=\s*'([^']*)'$")
_INTERSECTS_RE = re.compile(
    r"^INTERSECTS\s*\(\s*geom\s*,\s*(.+)\)$", re.IGNORECASE | re.DOTALL)
_DWITHIN_RE = re.compile(
    r"^DWITHIN\s*\(\s*geom\s*,\s*POINT\s*\(\s*([-\d.eE+]+)\s+([-\d.eE+]+)"
    r"\s*\)\s*,\s*([-\d.eE+]+)\s*,\s*meters\s*\)$", re.IGNORECASE)


@dataclass
class CqlQuery:
    """Parsed CQL: planner predicates + geometry dispatch lists (a
    conjunction may carry several INTERSECTS / DWITHIN clauses — every
    one participates)."""

    spec: QuerySpec = field(default_factory=QuerySpec)
    geometry_wkts: list = field(default_factory=list)  # INTERSECTS targets
    dwithins: list = field(default_factory=list)       # (lon, lat, dist_m)


def _parse_iso(s: str) -> int:
    s = s.rstrip("Zz")
    for fmt in ("%Y-%m-%dT%H:%M:%S", "%Y-%m-%d"):
        try:
            return calendar.timegm(_time.strptime(s, fmt))
        except ValueError:
            continue
    raise ValueError(f"unparseable CQL timestamp {s!r}")


def split_or(expr: str) -> list[str]:
    """Split on top-level OR (same parens/quote awareness as the AND
    splitter) — the engine executes each disjunct and de-duplicating
    unions the results (the reference's OR-split normalization,
    ``scan_or``'s role at the query-string level)."""
    parts, depth, start, i = [], 0, 0, 0
    in_str = False
    while i < len(expr):
        ch = expr[i]
        if in_str:
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and expr[i:i + 4].upper() == " OR ":
            parts.append(expr[start:i])
            i += 3
            start = i + 1
        i += 1
    parts.append(expr[start:])
    return [p.strip() for p in parts if p.strip()]


def _split_and(expr: str) -> list[str]:
    """Split on top-level AND (parens- and quote-aware). The AND probe
    slices the ORIGINAL string (upper() can change string length for
    characters like 'ß', which would misalign clause boundaries)."""
    parts, depth, start, i = [], 0, 0, 0
    in_str = False
    while i < len(expr):
        ch = expr[i]
        if in_str:
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and expr[i:i + 5].upper() == " AND ":
            parts.append(expr[start:i])
            i += 4
            start = i + 1
        i += 1
    parts.append(expr[start:])
    return [p.strip() for p in parts if p.strip()]


def _and_interval(cur: tuple | None, t0, t1) -> tuple:
    """Conjoin time clauses by INTERSECTION (t0 = max, t1 = min) — a
    later clause must never widen an earlier one."""
    c0, c1 = cur or (None, None)
    n0 = c0 if t0 is None else (t0 if c0 is None else max(c0, t0))
    n1 = c1 if t1 is None else (t1 if c1 is None else min(c1, t1))
    return (n0, n1)


def parse_cql(expr: str) -> CqlQuery:
    out = CqlQuery()
    for clause in _split_and(expr.strip()):
        m = _BBOX_RE.match(clause)
        if m:
            x0, y0, x1, y1 = (float(m.group(i)) for i in range(1, 5))
            if out.spec.bbox is None:
                out.spec.bbox = (x0, x1, y0, y1)
            else:  # two BBOX clauses conjoin by intersection
                b = out.spec.bbox
                out.spec.bbox = (max(b[0], x0), min(b[1], x1),
                                 max(b[2], y0), min(b[3], y1))
            continue
        m = _DURING_RE.match(clause)
        if m:
            out.spec.interval_s = _and_interval(
                out.spec.interval_s, _parse_iso(m.group(1)),
                _parse_iso(m.group(2)))
            continue
        m = _AFTER_RE.match(clause)
        if m:
            out.spec.interval_s = _and_interval(
                out.spec.interval_s, _parse_iso(m.group(1)), None)
            continue
        m = _BEFORE_RE.match(clause)
        if m:
            out.spec.interval_s = _and_interval(
                out.spec.interval_s, None, _parse_iso(m.group(1)))
            continue
        m = _DWITHIN_RE.match(clause)
        if m:
            out.dwithins.append((float(m.group(1)), float(m.group(2)),
                                 float(m.group(3))))
            continue
        m = _INTERSECTS_RE.match(clause)
        if m:
            out.geometry_wkts.append(m.group(1).strip())
            continue
        m = _IN_RE.match(clause)
        if m:
            vals = re.findall(r"'([^']*)'", m.group(2))
            col = m.group(1)
            if col == "image_id":
                sets = out.spec.id_sets or []
                sets.append(vals)
                out.spec.id_sets = sets
                out.spec.ids = vals if out.spec.ids is None else out.spec.ids
            else:
                raise ValueError(f"IN only supported on image_id, got {col}")
            continue
        m = _EQ_RE.match(clause)
        if m:
            out.spec.attr_eq[m.group(1)] = m.group(2)
            continue
        raise ValueError(f"unsupported CQL clause: {clause!r}")
    return out
