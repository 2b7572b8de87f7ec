"""Minimal ESRI Shapefile (.shp/.dbf) reader/writer — pure Python/NumPy.

Reference parity: the reference's ingest tooling accepts shapefiles via
GeoTools (``geomesa-tools`` ingest commands). No GIS library ships in
this sandbox, so this module implements the public shapefile spec
directly for the shapes the engine joins on: Point (1), PolyLine (3),
Polygon (5) — plus the dBASE III attribute table (.dbf) with C/N/F
fields. Geometry comes out as lon/lat columns (points) or the engine's
WKT (lines/polygons, ring sets preserved so holes survive), slotting
straight into the existing join surface.

Point coordinate decoding is one vectorized ``np.frombuffer`` pass over
the record array (fixed 28-byte records); multi-part shapes decode per
record (they are query-side geometry — few rows).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

SHP_MAGIC = 9994
SHAPE_POINT = 1
SHAPE_POLYLINE = 3
SHAPE_POLYGON = 5


# ----------------------------------------------------------------- read

def read_shp(path: str) -> pa.Table:
    """.shp -> (record, kind, lon, lat, wkt). Points fill lon/lat (wkt
    empty); polylines/polygons fill wkt (lon/lat NaN)."""
    with open(path, "rb") as f:
        data = f.read()
    code, = struct.unpack(">i", data[0:4])
    if code != SHP_MAGIC:
        raise ValueError(f"{path}: not a shapefile (magic {code})")
    shape_type, = struct.unpack("<i", data[32:36])

    recs, kinds, lons, lats, wkts = [], [], [], [], []
    pos = 100
    if shape_type == SHAPE_POINT:
        # vectorized: every record is 8 (rec header) + 4 (type) + 16 (x,y)
        if (len(data) - 100) % 28 != 0:
            raise NotImplementedError(
                f"{path}: point file with irregular record sizes "
                "(null or mixed shapes) — not supported")
        n = (len(data) - 100) // 28
        raw = np.frombuffer(data, dtype=np.uint8, count=n * 28, offset=100)
        raw = raw.reshape(n, 28)
        stypes = raw[:, 8:12].copy().view("<i4").ravel()
        if not (stypes == SHAPE_POINT).all():
            # a null shape (type 0, 4-byte body) would shift the 28-byte
            # stride and silently corrupt every later coordinate
            raise NotImplementedError(
                f"{path}: non-Point record (type "
                f"{int(stypes[stypes != SHAPE_POINT][0])}) in point file")
        xy = raw[:, 12:28].copy().view("<f8").reshape(n, 2)
        recnum = raw[:, 0:4].copy().view(">i4").ravel()
        return pa.table({
            "record": pa.array(recnum.astype(np.int64)),
            "kind": pa.array(["point"] * n, pa.string()),
            "lon": pa.array(xy[:, 0]),
            "lat": pa.array(xy[:, 1]),
            "wkt": pa.array([""] * n, pa.string()),
        })
    while pos < len(data):
        recnum, content_words = struct.unpack(">ii", data[pos:pos + 8])
        pos += 8
        body = data[pos:pos + content_words * 2]
        pos += content_words * 2
        stype, = struct.unpack("<i", body[0:4])
        if stype == 0:  # null shape
            continue
        if stype not in (SHAPE_POLYLINE, SHAPE_POLYGON):
            raise NotImplementedError(f"shape type {stype} not supported")
        nparts, npoints = struct.unpack("<ii", body[36:44])
        parts = np.frombuffer(body, "<i4", nparts, 44)
        pts = np.frombuffer(body, "<f8", npoints * 2,
                            44 + nparts * 4).reshape(npoints, 2)
        bounds = np.append(parts, npoints)
        rings = [pts[bounds[i]:bounds[i + 1]] for i in range(nparts)]
        if stype == SHAPE_POLYLINE:
            if nparts != 1:
                raise NotImplementedError(
                    f"{path}: multi-part PolyLine record {recnum} "
                    f"({nparts} parts) — only single-part polylines map "
                    "onto the LINESTRING join surface")
            coords = ", ".join(f"{x:.10g} {y:.10g}" for x, y in rings[0])
            wkt = f"LINESTRING ({coords})"
            kind = "line"
        else:
            wkt, kind = _rings_to_wkt(rings)
        recs.append(recnum)
        kinds.append(kind)
        lons.append(float("nan"))
        lats.append(float("nan"))
        wkts.append(wkt)
    return pa.table({
        "record": pa.array(recs, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "lon": pa.array(lons, pa.float64()),
        "lat": pa.array(lats, pa.float64()),
        "wkt": pa.array(wkts, pa.string()),
    })


def _signed_area(r: np.ndarray) -> float:
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def _point_in_ring(px: float, py: float, r: np.ndarray) -> bool:
    x, y = r[:, 0], r[:, 1]
    xb, yb = np.roll(x, -1), np.roll(y, -1)
    crosses = (y > py) != (yb > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x + (py - y) * (xb - x) / (yb - y)
    return bool((crosses & (px < xint)).sum() % 2)


def _rings_to_wkt(rings: list) -> tuple[str, str]:
    """Polygon record rings -> engine WKT. The ESRI spec orders rings by
    WINDING only (outer = clockwise, holes = counter-clockwise) — ring 0
    need not be the shell, and several outer rings are legal. Shells are
    detected by signed area; each hole is assigned to the outer ring
    containing its first vertex; multiple shells emit MULTIPOLYGON."""
    rings = [np.asarray(r, dtype=np.float64) for r in rings]
    areas = [_signed_area(r) for r in rings]
    outers = [i for i, a in enumerate(areas) if a < 0]  # CW in ESRI
    holes = [i for i, a in enumerate(areas) if a >= 0]
    if not outers:  # mis-wound file: keep record order as-is
        outers, holes = [0], list(range(1, len(rings)))

    def ring_txt(r):
        return "(" + ", ".join(f"{x:.10g} {y:.10g}" for x, y in r) + ")"

    groups = {i: [rings[i]] for i in outers}
    for h in holes:
        px, py = rings[h][0]
        owner = next((o for o in outers
                      if _point_in_ring(px, py, rings[o])), outers[0])
        groups[owner].append(rings[h])
    if len(outers) == 1:
        parts = groups[outers[0]]
        return ("POLYGON (" + ", ".join(ring_txt(r) for r in parts) + ")",
                "poly")
    polys = ["(" + ", ".join(ring_txt(r) for r in groups[o]) + ")"
             for o in outers]
    return "MULTIPOLYGON (" + ", ".join(polys) + ")", "multipoly"


def read_dbf(path: str) -> pa.Table:
    """dBASE III attribute table -> arrow (C -> string, N/F -> number)."""
    with open(path, "rb") as f:
        data = f.read()
    n_records, = struct.unpack("<i", data[4:8])
    header_len, record_len = struct.unpack("<hh", data[8:12])
    fields = []
    pos = 32
    while data[pos] != 0x0D:
        name = data[pos:pos + 11].split(b"\x00")[0].decode("latin-1")
        ftype = chr(data[pos + 11])
        flen = data[pos + 16]
        fields.append((name, ftype, flen))
        pos += 32
    cols: dict[str, list] = {name: [] for name, _, _ in fields}
    for r in range(n_records):
        base = header_len + r * record_len + 1  # +1 deletion flag
        off = 0
        for name, ftype, flen in fields:
            # dBASE III text is conventionally cp437/latin-1, not UTF-8;
            # latin-1 decodes every byte so non-ASCII attributes degrade
            # readably instead of aborting the ingest
            raw = data[base + off:base + off + flen].decode("latin-1").strip()
            off += flen
            if ftype in ("N", "F"):
                cols[name].append(float(raw) if raw else None)
            else:
                cols[name].append(raw)
    out = {}
    for name, ftype, _ in fields:
        if ftype in ("N", "F"):
            vals = cols[name]
            if all(v is None or float(v).is_integer() for v in vals):
                out[name] = pa.array(
                    [None if v is None else int(v) for v in vals], pa.int64())
            else:
                out[name] = pa.array(vals, pa.float64())
        else:
            out[name] = pa.array(cols[name], pa.string())
    return pa.table(out)


def read_shapefile(shp_path: str) -> pa.Table:
    """Join .shp geometry with its .dbf attributes by record order."""
    geo = read_shp(shp_path)
    dbf_path = shp_path[:-4] + ".dbf"
    import os

    if os.path.exists(dbf_path):
        attrs = read_dbf(dbf_path)
        if attrs.num_rows == geo.num_rows:
            for name in attrs.column_names:
                geo = geo.append_column(name, attrs.column(name))
    return geo


def shapefile_ingest(paths, spec: dict | None = None):
    """Distributed shapefile ingest: one task per file (the converter
    shape shared with avro/xml_ingest)."""
    from geomesa_ray.functions import transform_batch
    from geomesa_ray.sources.ingest import _per_file

    def load(batch: pa.Table) -> pa.Table:
        t = pa.concat_tables([read_shapefile(p)
                              for p in batch.column("path").to_pylist()])
        return transform_batch(t, spec) if spec else t

    return _per_file(paths).map_batches(load, batch_format="pyarrow",
                                        batch_size=None)


# ---------------------------------------------------------------- write

def write_shapefile(shp_path: str, kind: str, records: list,
                    attrs: dict | None = None):
    """Test/fixture producer. ``records``: for 'point', [(x, y)]; for
    'poly', [[ring, ...]] with ring = [(x, y), ...]; for 'line',
    [[(x, y), ...]]. ``attrs``: {name: list} (str or int)."""
    bodies = []
    allx, ally = [], []
    for i, rec in enumerate(records):
        if kind == "point":
            x, y = rec
            body = struct.pack("<idd", SHAPE_POINT, x, y)
            allx.append(x)
            ally.append(y)
        else:
            stype = SHAPE_POLYGON if kind == "poly" else SHAPE_POLYLINE
            rings = rec if kind == "poly" else [rec]
            pts = [p for ring in rings for p in ring]
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            allx.extend(xs)
            ally.extend(ys)
            parts = []
            acc = 0
            for ring in rings:
                parts.append(acc)
                acc += len(ring)
            body = struct.pack("<idddd", stype, min(xs), min(ys),
                               max(xs), max(ys))
            body += struct.pack("<ii", len(rings), len(pts))
            body += struct.pack(f"<{len(parts)}i", *parts)
            for x, y in pts:
                body += struct.pack("<dd", x, y)
        bodies.append(struct.pack(">ii", i + 1, len(body) // 2) + body)
    content = b"".join(bodies)
    total_words = (100 + len(content)) // 2
    stype = {"point": SHAPE_POINT, "poly": SHAPE_POLYGON,
             "line": SHAPE_POLYLINE}[kind]
    header = struct.pack(">i5ii", SHP_MAGIC, 0, 0, 0, 0, 0, total_words)
    header += struct.pack("<ii", 1000, stype)
    header += struct.pack("<4d", min(allx), min(ally), max(allx), max(ally))
    header += struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)
    with open(shp_path, "wb") as f:
        f.write(header + content)
    if attrs:
        _write_dbf(shp_path[:-4] + ".dbf", attrs, len(records))


def _write_dbf(path: str, attrs: dict, n: int):
    fields = []
    for name, vals in attrs.items():
        if all(isinstance(v, int) for v in vals):
            fields.append((name, "N", 18))
        else:
            fields.append((name, "C", max(1, max(len(str(v)) for v in vals))))
    record_len = 1 + sum(f[2] for f in fields)
    header_len = 32 + 32 * len(fields) + 1
    out = bytearray()
    out += struct.pack("<4Bi2h20x", 3, 26, 8, 17, n, header_len, record_len)
    for name, ftype, flen in fields:
        out += name.encode().ljust(11, b"\x00")
        out += ftype.encode()
        out += b"\x00" * 4 + bytes([flen]) + b"\x00" * 15
    out += b"\x0D"
    for r in range(n):
        out += b" "
        for name, ftype, flen in fields:
            v = str(attrs[name][r])
            out += (v.rjust(flen) if ftype == "N" else v.ljust(flen)).encode()
    out += b"\x1A"
    with open(path, "wb") as f:
        f.write(bytes(out))
