"""Point-in-polygon spatial join — the engine's flagship operator.

Reference parity: every GeoMesa spatial query IS a PIP join of indexed
points against query geometry (``process/query/QueryProcess.scala:24-35``;
``Z3IdxStrategy.scala:56-68,130-164``): geometry is decomposed into
covering index cells (``GeohashUtils.decomposeGeometry``,
``GeohashUtils.scala:637-701``), cell ranges are scanned, and an exact
geometry predicate refines. Here:

- **Region index** (driver-side, once): each region geometry is covered by
  Z2 cells at an adaptive level (finest level whose bbox cover stays under
  ``max_cells``, the role of the reference's <=100-cell decomposition cap).
  The index maps (level, cell) -> candidate region ordinals (CSR layout),
  and is broadcast via ``ray.put`` — read once per actor, never re-shipped
  per batch.
- **Probe stage**: an actor-pool ``map_batches`` over the point table.
  Candidate lookup is a vectorized searchsorted against the cell keys;
  exact refinement loops over the (few) candidate regions, each testing
  its gathered points with vectorized bbox/PIP kernels + the time
  interval. The per-actor region index is the analog of the reference's
  per-tserver iterator state / STRtree caches
  (``SynchronizedQuadtree.scala``, ``GeoMesaSpark.scala:170-202``).

Because each point owns exactly one cell and each region is indexed at
exactly one level, a (point, region) pair is tested at most once — the
emit-guard that makes the reference's ``DeDuplicatingIterator`` unneeded
(``IndexSchema.mayContainDuplicates:300-307``).

Scale notes (100 TB / 10^12 rows): the broadcast side is
O(regions x cells) and independent of point count; the point side streams
with zero shuffle. For region sets too large to broadcast, use
``pip_join_cogroup`` (explicit cell co-partition with hot-cell salting).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
import ray.data

from geomesa_ray.curve.sfc import Z2Grid
from geomesa_ray.geom.kernels import (
    Polygon,
    dist_sq_to_polyline_deg,
    points_in_rings,
    split_idl_polygon,
)
from geomesa_ray.geom.wkt import parse_wkt_geometry
from geomesa_ray.sources.io import read_images
from geomesa_ray.stages.encode import DEFAULT_CELL_LEVEL, derive_and_encode

MAX_COVER_CELLS = 256


@dataclass
class RegionIndex:
    """Immutable broadcastable candidate index over regions."""

    max_level: int
    # per indexed level: sorted cell keys + CSR offsets into region ordinals
    levels: dict  # level -> (cells:int64[], offsets:int32[], ordinals:int32[])
    region_ids: list
    kinds: list           # 'box' | 'poly' | 'multipoly' | 'line'
    bbox: np.ndarray      # [n, 4] lon_min, lon_max, lat_min, lat_max
    t_start_s: np.ndarray
    t_end_s: np.ndarray
    # areal geometry: list of RING SETS per region (each ring set =
    # [shell, hole, ...]; 'poly' gets one set per IDL part, 'multipoly'
    # one per member polygon); [] for boxes and lines
    polys: list
    # corridor geometry: (xs, ys) polyline vertices per region (None for
    # non-line kinds) + per-region buffer half-width in degrees
    lines: list = None
    line_buf: np.ndarray = None

    def lookup(self, cell: np.ndarray):
        """cell (at max_level) -> candidate (point_idx, region_ordinal) pairs."""
        pts_all = []
        ords_all = []
        for level, (cells, offsets, ordinals) in self.levels.items():
            key = cell >> np.int64(2 * (self.max_level - level))
            pos = np.searchsorted(cells, key)
            pos_c = np.clip(pos, 0, len(cells) - 1)
            hit = cells[pos_c] == key
            hit_pts = np.nonzero(hit)[0]
            if len(hit_pts) == 0:
                continue
            b = pos_c[hit_pts]
            counts = offsets[b + 1] - offsets[b]
            pts_all.append(np.repeat(hit_pts, counts))
            # gather ordinal slices: build ranges [offsets[b], offsets[b]+counts)
            starts = np.repeat(offsets[b], counts)
            within = np.arange(counts.sum(), dtype=np.int64) - np.repeat(
                np.cumsum(counts) - counts, counts)
            ords_all.append(ordinals[starts + within])
        if not pts_all:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int32))
        return np.concatenate(pts_all), np.concatenate(ords_all)


def region_polys(kind: str, wkt: str) -> list[list[Polygon]]:
    """WKT -> ring sets (see RegionIndex.polys). IDL-crossing longitudes
    (vertices beyond +-180) are split per
    ``GeohashUtils.getInternationalDateLineSafeGeometry``; supported for
    hole-free rings only (an IDL polygon with holes raises)."""
    if kind == "box" or not wkt:
        return []
    wkind, parts = parse_wkt_geometry(wkt)
    if wkind == "line":
        raise ValueError("line geometry parses via region_line()")
    out = []
    for rings in parts:
        shell = rings[0]
        crosses = shell.xs.max() > 180.0 or shell.xs.min() < -180.0
        if crosses:
            if len(rings) > 1:
                raise NotImplementedError(
                    "IDL-crossing polygon with interior rings")
            out.extend([p] for p in split_idl_polygon(shell.xs, shell.ys))
        else:
            out.append(rings)
    return out


def choose_cover_level(lon0, lon1, lat0, lat1, max_level: int,
                       max_cells: int = MAX_COVER_CELLS) -> int:
    """Finest level (<= max_level) whose bbox cover has <= max_cells cells
    (role of the reference's decomposition caps, GeohashUtils.scala:638-639)."""
    for level in range(max_level, -1, -1):
        nx = (lon1 - lon0) / (360.0 / (1 << level)) + 2
        ny = (lat1 - lat0) / (180.0 / (1 << level)) + 2
        if nx * ny <= max_cells:
            return level
    return 0


def build_region_index(regions: pa.Table, max_level: int = DEFAULT_CELL_LEVEL,
                       max_cells: int = MAX_COVER_CELLS) -> RegionIndex:
    n = regions.num_rows
    cols = {c: regions.column(c).to_pylist() for c in
            ("region_id", "kind", "lon_min", "lon_max", "lat_min", "lat_max", "wkt")}
    ts = regions.column("t_start").cast(pa.int64()).to_numpy() // 1_000_000
    te = regions.column("t_end").cast(pa.int64()).to_numpy() // 1_000_000

    bufs = (regions.column("buf_deg").to_pylist()
            if "buf_deg" in regions.column_names else [0.0] * n)
    polys = []
    lines = []
    line_buf = np.zeros(n)
    per_level: dict[int, dict[int, list[int]]] = {}
    bbox = np.zeros((n, 4))
    for i in range(n):
        kind = cols["kind"][i]
        if kind == "line":
            _, parts = parse_wkt_geometry(cols["wkt"][i])
            xs, ys = parts[0]
            buf = float(bufs[i] or 0.0)
            polys.append([])
            lines.append((xs, ys))
            line_buf[i] = buf
            # corridor cover = polyline bbox expanded by the buffer
            boxes = [(float(xs.min()) - buf, float(xs.max()) + buf,
                      float(ys.min()) - buf, float(ys.max()) + buf)]
        else:
            plist = region_polys(kind, cols["wkt"][i])
            polys.append(plist)
            lines.append(None)
            if plist:
                # one cover per ring set (IDL part / member polygon): the
                # shell's bbox bounds the set (holes lie inside it); the
                # exact test rejects per ring set
                boxes = [rs[0].bbox for rs in plist]
            else:
                boxes = [(cols["lon_min"][i], cols["lon_max"][i],
                          cols["lat_min"][i], cols["lat_max"][i])]
        bbox[i] = (min(b[0] for b in boxes), max(b[1] for b in boxes),
                   min(b[2] for b in boxes), max(b[3] for b in boxes))
        for (b0, b1, c0, c1) in boxes:
            level = choose_cover_level(b0, b1, c0, c1, max_level, max_cells)
            cells = Z2Grid(level).bbox_cells(
                max(b0, -180.0), min(b1, 180.0 - 1e-12),
                max(c0, -90.0), min(c1, 90.0 - 1e-12))
            bucket = per_level.setdefault(level, {})
            for c in np.unique(np.asarray(cells)):
                bucket.setdefault(int(c), []).append(i)

    levels = {}
    for level, bucket in per_level.items():
        cells = np.array(sorted(bucket.keys()), dtype=np.int64)
        ordinals = []
        offsets = [0]
        for c in cells:
            # a region may cover the same cell via two IDL parts — dedup
            members = sorted(set(bucket[int(c)]))
            ordinals.extend(members)
            offsets.append(len(ordinals))
        levels[level] = (cells, np.array(offsets, dtype=np.int64),
                         np.array(ordinals, dtype=np.int32))

    return RegionIndex(
        max_level=max_level, levels=levels,
        region_ids=cols["region_id"], kinds=cols["kind"], bbox=bbox,
        t_start_s=ts, t_end_s=te, polys=polys, lines=lines,
        line_buf=line_buf,
    )


def build_region_index_distributed(regions_ds,
                                   max_level: int = DEFAULT_CELL_LEVEL,
                                   max_cells: int = MAX_COVER_CELLS
                                   ) -> RegionIndex:
    """Distributed twin of :func:`build_region_index` for region sets
    too large to parse/cover on the driver (~10^6+): WKT parsing, IDL
    splitting, and cell-cover computation run inside ``map_batches``
    over the regions Dataset; the driver only gathers SKINNY
    (region_id, level, cell) rows plus per-region metadata and
    assembles an EQUIVALENT CSR index (join-output equality-tested —
    region ordinals are renumbered in sorted-id order, so the index is
    not byte-identical to the driver build). The assembled index is
    still driver-resident — it is the broadcast side — so this moves
    the COMPUTE off the driver, not the index itself.

    Requires unique, non-null region_ids (the id is the cross-block
    join key; GeoMesa feature ids satisfy this by contract) — raises
    otherwise rather than silently merging rows."""
    import pickle

    import ray.data as _rd

    def cover(batch: pa.Table) -> pa.Table:
        sub = build_region_index(batch, max_level, max_cells)
        rid_parts, lvl_parts, cell_parts = [], [], []
        ids_arr = np.asarray(sub.region_ids, dtype=object)
        for level, (cells, offsets, ordinals) in sub.levels.items():
            counts = np.diff(offsets)
            cell_parts.append(np.repeat(cells, counts))
            lvl_parts.append(np.full(int(counts.sum()), level,
                                     dtype=np.int64))
            rid_parts.append(ids_arr[ordinals])
        rid_rows = (np.concatenate(rid_parts).tolist() if rid_parts else [])
        lvl_rows = (np.concatenate(lvl_parts).tolist() if lvl_parts else [])
        cell_rows = (np.concatenate(cell_parts).tolist()
                     if cell_parts else [])
        meta = [pickle.dumps((sub.kinds[i], sub.bbox[i],
                              int(sub.t_start_s[i]), int(sub.t_end_s[i]),
                              sub.polys[i], sub.lines[i],
                              float(sub.line_buf[i])))
                for i in range(len(sub.region_ids))]
        n_cells = len(rid_rows)
        n_meta = len(meta)
        return pa.table({
            "region_id": pa.array(rid_rows + list(sub.region_ids),
                                  pa.string()),
            "level": pa.array(lvl_rows + [-1] * n_meta, pa.int64()),
            "cell": pa.array([int(c) for c in cell_rows] + [0] * n_meta,
                             pa.int64()),
            "meta": pa.array([b""] * n_cells + meta, pa.binary()),
        })

    if isinstance(regions_ds, pa.Table):
        regions_ds = _rd.from_arrow(regions_ds)
    refs = ray.get(regions_ds.map_batches(
        cover, batch_format="pyarrow").to_arrow_refs())
    refs = [t for t in refs if t.num_rows and "level" in t.column_names]
    if not refs:  # zero regions: a valid empty index
        return RegionIndex(
            max_level=max_level, levels={}, region_ids=[], kinds=[],
            bbox=np.zeros((0, 4)), t_start_s=np.zeros(0, dtype=np.int64),
            t_end_s=np.zeros(0, dtype=np.int64), polys=[], lines=[],
            line_buf=np.zeros(0))
    rows = pa.concat_tables(refs)

    is_meta = rows.column("level").to_numpy(zero_copy_only=False) == -1
    meta_t = rows.filter(pa.array(is_meta))
    cell_t = rows.filter(pa.array(~is_meta))

    all_ids = meta_t.column("region_id").to_pylist()
    if any(i is None for i in all_ids) or len(set(all_ids)) != len(all_ids):
        raise ValueError(
            "build_region_index_distributed requires unique non-null "
            "region_id values (the cross-block join key)")
    rid_order = np.argsort(np.asarray(all_ids, dtype=object), kind="stable")
    metas = meta_t.column("meta").to_pylist()
    region_ids = [all_ids[int(i)] for i in rid_order]
    kinds, bbox, ts, te, polys, lines, bufs = [], [], [], [], [], [], []
    for i in rid_order:
        k, b, t0, t1, p, ln, bf = pickle.loads(metas[int(i)])
        kinds.append(k)
        bbox.append(b)
        ts.append(t0)
        te.append(t1)
        polys.append(p)
        lines.append(ln)
        bufs.append(bf)

    sorted_ids = np.asarray(region_ids, dtype=object)
    crids = np.asarray(cell_t.column("region_id").to_pylist(), dtype=object)
    ords = np.searchsorted(sorted_ids, crids).astype(np.int32)
    lvls = cell_t.column("level").to_numpy(zero_copy_only=False)
    cells = cell_t.column("cell").to_numpy(zero_copy_only=False)
    levels = {}
    for lv in np.unique(lvls):
        m = lvls == lv
        c, o = cells[m], ords[m]
        order = np.lexsort((o, c))
        cs, os_ = c[order], o[order]
        uniq, start = np.unique(cs, return_index=True)
        offsets = np.append(start, len(cs)).astype(np.int64)
        levels[int(lv)] = (uniq.astype(np.int64), offsets,
                           os_.astype(np.int32))

    return RegionIndex(
        max_level=max_level, levels=levels, region_ids=region_ids,
        kinds=kinds, bbox=np.asarray(bbox), t_start_s=np.asarray(ts),
        t_end_s=np.asarray(te), polys=polys, lines=lines,
        line_buf=np.asarray(bufs),
    )


def refine_candidates(idx: RegionIndex, pts: np.ndarray, ords: np.ndarray,
                      lon: np.ndarray, lat: np.ndarray,
                      dtg_s: np.ndarray):
    """Exact test for candidate (point, region) pairs; returns kept pairs."""
    if len(pts) == 0:
        return pts, ords
    keep = np.zeros(len(pts), dtype=bool)
    order = np.argsort(ords, kind="stable")
    sp = pts[order]
    so = ords[order]
    bounds = np.searchsorted(so, np.arange(len(idx.region_ids) + 1))
    for r in np.unique(so):
        s, e = bounds[r], bounds[r + 1]
        p = sp[s:e]
        plon, plat, pt = lon[p], lat[p], dtg_s[p]
        ok = (pt >= idx.t_start_s[r]) & (pt <= idx.t_end_s[r])
        kind = idx.kinds[r]
        if kind == "box":
            b = idx.bbox[r]
            ok &= (plon >= b[0]) & (plon <= b[1]) & (plat >= b[2]) & (plat <= b[3])
        elif kind == "line":
            xs, ys = idx.lines[r]
            buf = idx.line_buf[r]
            ok &= dist_sq_to_polyline_deg(plon, plat, xs, ys) <= buf * buf
        else:  # 'poly' / 'multipoly': union over ring sets, even-odd holes
            inside = np.zeros(len(p), dtype=bool)
            for rings in idx.polys[r]:
                inside |= points_in_rings(plon, plat, rings)
            ok &= inside
        keep[order[s:e]] = ok
    return pts[keep], ords[keep]


def _refine_batch(idx: RegionIndex, batch: pa.Table, emit_cols) -> pa.Table:
    cell = batch.column("cell").to_numpy(zero_copy_only=False)
    lon = batch.column("lon").to_numpy(zero_copy_only=False)
    lat = batch.column("lat").to_numpy(zero_copy_only=False)
    dtg_s = batch.column("dtg_s").to_numpy(zero_copy_only=False)
    pts, ords = idx.lookup(cell)
    pts, ords = refine_candidates(idx, pts, ords, lon, lat, dtg_s)
    cols = {}
    idx_arr = pa.array(pts)
    for c in emit_cols:
        col = batch.column(c)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        cols[c] = col.take(idx_arr)
    rid = np.asarray(idx.region_ids, dtype=object)[ords]
    cols["region_id"] = pa.array(rid.tolist(), type=pa.string())
    return pa.table(cols)


class PIPRefiner:
    """Actor-pool variant of the refine stage — use when the region index
    is large enough that per-worker cached resolution should be pinned to
    long-lived actors (constructor resolves the broadcast ref once)."""

    def __init__(self, index, emit_cols=("image_id",)):
        # fn_constructor_args ObjectRefs are NOT auto-resolved by Ray Data
        # actor pools — ray.get here runs once per actor.
        self.idx: RegionIndex = ray.get(index) if isinstance(index, ray.ObjectRef) else index
        self.emit_cols = emit_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _refine_batch(self.idx, batch, self.emit_cols)


def pip_join_points(points_ds: ray.data.Dataset, regions: pa.Table,
                    cell_level: int = DEFAULT_CELL_LEVEL,
                    emit_cols=("image_id",),
                    concurrency=None) -> ray.data.Dataset:
    """Join an already-keyed point Dataset (lon/lat/dtg_s/cell columns)
    against a broadcast region table. Zero shuffle.

    Default compute is task-based with a worker-cached broadcast resolve
    (warm workers, no actor-spawn latency); pass ``concurrency`` to pin an
    actor pool instead (better for very large indexes).
    """
    from geomesa_ray.util import resolve_broadcast

    index = build_region_index(regions, max_level=cell_level)
    ref = ray.put(index)  # broadcast once; cached per worker, never per batch
    emit = tuple(emit_cols)
    if concurrency is not None:
        return points_ds.map_batches(
            PIPRefiner, fn_constructor_args=(ref, emit),
            batch_format="pyarrow", concurrency=concurrency)

    def refine(batch: pa.Table) -> pa.Table:
        return _refine_batch(resolve_broadcast(ref), batch, emit)

    return points_ds.map_batches(refine, batch_format="pyarrow",
                                 batch_size=65536)


def attach_payload(join_ds: ray.data.Dataset, fixture_dir: str,
                   payload_cols=("caption", "bytes"),
                   num_partitions: int = 16) -> ray.data.Dataset:
    """Re-attach heavy payload columns to skinny join output by hash join
    on image_id — the reference's index-value vs full-value split
    (``IndexValueEncoder.scala:26-80``): shuffles carry only skinny keys;
    image bytes move exactly once, here, at the end.
    """
    from geomesa_ray.sources.io import read_images

    payload = read_images(fixture_dir,
                          columns=["image_id", *payload_cols])
    return join_ds.join(payload, join_type="inner",
                        num_partitions=num_partitions, on=("image_id",))


def pip_join(fixture_dir: str, regions: pa.Table | None = None,
             kinds: tuple = ("box", "poly"),
             cell_level: int = DEFAULT_CELL_LEVEL,
             emit_cols=("image_id",),
             concurrency=None) -> ray.data.Dataset:
    """End-to-end flagship pipeline: read skinny image projection ->
    derive geometry -> encode cells -> broadcast PIP join.

    Returns a Dataset of (emit_cols..., region_id) join rows.
    """
    import pyarrow.compute as pc

    if regions is None:
        import pyarrow.parquet as pq
        import os

        regions = pq.read_table(os.path.join(fixture_dir, "regions.parquet"))
    regions = regions.filter(pc.field("kind").isin(list(kinds)))
    # prune the read to source columns only; derived emit_cols (lon/lat/
    # cell/week/z3/dtg_s) are added by the encode stage
    source_cols = {"image_id", "bytes", "w", "h", "fmt", "caption", "phash"}
    need = list(dict.fromkeys(
        [c for c in emit_cols if c in source_cols] + ["phash"]))
    ds = read_images(fixture_dir, columns=need)
    ds = ds.map_batches(derive_and_encode, batch_format="pyarrow",
                        fn_kwargs={"cell_level": cell_level})
    return pip_join_points(ds, regions, cell_level, emit_cols, concurrency)
