"""Minimal WKT POLYGON parse/format (fixture + API surface only).

The reference parses WKT via JTS (``geomesa-convert/.../Transformers.scala``
geometry constructor functions). We only need POLYGON (single ring, no
holes) and POINT for fixtures and the public API.
"""

from __future__ import annotations

import re

import numpy as np

from geomesa_ray.geom.kernels import Polygon

_POLY_RE = re.compile(r"^\s*POLYGON\s*\(\(\s*(.*?)\s*\)\)\s*$", re.IGNORECASE | re.DOTALL)
_POINT_RE = re.compile(r"^\s*POINT\s*\(\s*([-\d.eE+]+)\s+([-\d.eE+]+)\s*\)\s*$", re.IGNORECASE)


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
