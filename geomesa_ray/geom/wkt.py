"""Minimal WKT parse/format: POINT, LINESTRING, POLYGON (with interior
rings), MULTIPOLYGON.

The reference parses WKT via JTS (``geomesa-convert/.../Transformers.scala``
geometry constructor functions) and joins against any JTS geometry
(``process/query/QueryProcess.scala:24-35``). The nested-paren splitter
below covers the geometry kinds the join surface supports; no fractional
grammar corners (EMPTY, Z/M coords, GEOMETRYCOLLECTION) — those raise.
"""

from __future__ import annotations

import re

import numpy as np

from geomesa_ray.geom.kernels import Polygon

_POLY_RE = re.compile(r"^\s*POLYGON\s*\(\(\s*(.*?)\s*\)\)\s*$", re.IGNORECASE | re.DOTALL)
_POINT_RE = re.compile(r"^\s*POINT\s*\(\s*([-\d.eE+]+)\s+([-\d.eE+]+)\s*\)\s*$", re.IGNORECASE)
_HEAD_RE = re.compile(r"^\s*([A-Za-z]+)\s*\((.*)\)\s*$", re.DOTALL)


def _split_top(text: str) -> list[str]:
    """Split a WKT body on top-level commas (depth-0 w.r.t. parens)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(text):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return parts


def _parse_coords(text: str) -> tuple[np.ndarray, np.ndarray]:
    xs, ys = [], []
    for pair in text.split(","):
        x, y = pair.split()
        xs.append(float(x))
        ys.append(float(y))
    return np.array(xs), np.array(ys)


def _strip_parens(text: str) -> str:
    t = text.strip()
    if not (t.startswith("(") and t.endswith(")")):
        raise ValueError(f"expected parenthesized ring: {t[:40]!r}")
    return t[1:-1]


def parse_wkt_geometry(wkt: str):
    """Parse WKT into (kind, parts):

    - ``("line", [(xs, ys)])`` for LINESTRING
    - ``("poly", [[Polygon, ...]])`` for POLYGON — one ring set, element
      0 the shell, the rest interior rings (holes)
    - ``("multipoly", [[Polygon, ...], ...])`` for MULTIPOLYGON — one
      ring set per member polygon
    """
    m = _HEAD_RE.match(wkt)
    if not m:
        raise ValueError(f"unparseable WKT: {wkt[:80]!r}")
    head = m.group(1).upper()
    body = m.group(2)
    if head == "LINESTRING":
        return "line", [_parse_coords(body)]
    if head == "POLYGON":
        rings = [Polygon(*_parse_coords(_strip_parens(r)))
                 for r in _split_top(body)]
        return "poly", [rings]
    if head == "MULTIPOLYGON":
        out = []
        for poly in _split_top(body):
            rings = [Polygon(*_parse_coords(_strip_parens(r)))
                     for r in _split_top(_strip_parens(poly))]
            out.append(rings)
        return "multipoly", out
    raise ValueError(f"unsupported WKT geometry type {head!r}")


def parse_wkt_polygon(wkt: str) -> Polygon:
    m = _POLY_RE.match(wkt)
    if not m:
        raise ValueError(f"not a single-ring POLYGON WKT: {wkt[:80]!r}")
    coords = []
    for pair in m.group(1).split(","):
        x, y = pair.split()
        coords.append((float(x), float(y)))
    xs = np.array([c[0] for c in coords])
    ys = np.array([c[1] for c in coords])
    return Polygon(xs, ys)


def parse_wkt_point(wkt: str) -> tuple[float, float]:
    m = _POINT_RE.match(wkt)
    if not m:
        raise ValueError(f"not a POINT WKT: {wkt[:80]!r}")
    return float(m.group(1)), float(m.group(2))


def polygon_to_wkt(poly: Polygon) -> str:
    pts = list(zip(poly.xs.tolist(), poly.ys.tolist()))
    pts.append(pts[0])
    inner = ", ".join(f"{x:.10g} {y:.10g}" for x, y in pts)
    return f"POLYGON (({inner}))"
