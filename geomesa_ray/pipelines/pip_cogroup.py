"""Co-partitioned PIP join with hot-cell salting — the scale path for
region sets too large to broadcast.

Reference parity: GeoMesa co-locates points and query geometry by index
cell (geohash decomposition written to the ST table,
``STIndexEntry.scala:43-103``) and spreads hot rows with a random shard
prefix (``IndexSchema.scala:108-113`` ``%999#r``, 4-bit murmur shard in
``Z3FeatureIdGenerator.scala:66-80``). Here:

1. Points are keyed by coarse cell (``flat_map``-free — one cell per
   point); a per-cell histogram (pre-aggregated per batch) finds hot
   cells.
2. Hot cells are SALTED: each point in a hot cell gets
   ``salt = mix(phash) % n_salt``; each REGION covering a hot cell is
   replicated to every salt — exactness is preserved because a
   (point, region) pair still meets in exactly one (cell, salt) bucket.
3. Regions explode to one row per covering cell (``flat_map`` role),
   each row CARRYING its region's serialized geometry payload — the
   refine task holds only its own group's geometries, never the full
   region index (which would defeat the purpose of this path: region
   sets too large to broadcast). Both sides shuffle by (cell, salt);
   ``groupby.map_groups`` refines with the same exact kernels as the
   broadcast join.
4. A point's cell may be covered by a region whose polygon does not
   contain it — the exact test filters; a pair can never meet twice
   (one cell per point, region rows deduped per cell), so no output
   dedup is needed (emit-guard, reference ``hasDuplicates`` analog,
   ``IndexSchema.mayContainDuplicates:300-307``).

The groupby is the one all-to-all; only skinny columns shuffle
(image_id, phash-derived keys — never payload bytes, reference
index-value precedent ``IndexValueEncoder.scala:26-80``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from geomesa_ray.pipelines.pip_join import build_region_index
from geomesa_ray.sources.fixtures import splitmix64
from geomesa_ray.sources.io import read_images
from geomesa_ray.stages.encode import derive_and_encode

COGROUP_CELL_LEVEL = 6  # coarse co-partition grid (4^6 = 4096 cells)


def _region_cell_table(regions: pa.Table, cell_level: int) -> tuple:
    """Explode regions to (cell, region ordinal) rows at the co-partition
    level (role of GeohashUtils.decomposeGeometry for writes)."""
    idx = build_region_index(regions, max_level=cell_level)
    cells, ords = [], []
    for level, (cls, offsets, ordinals) in idx.levels.items():
        shift = 2 * (cell_level - level)
        for i, c in enumerate(cls):
            members = ordinals[offsets[i]:offsets[i + 1]]
            if shift == 0:
                for m in members:
                    cells.append(int(c))
                    ords.append(int(m))
            else:
                # expand the coarser cell to all level-`cell_level` children
                base = int(c) << shift
                for child in range(1 << shift):
                    for m in members:
                        cells.append(base + child)
                        ords.append(int(m))
    return pa.table({"cell": pa.array(cells, pa.int64()),
                     "ord": pa.array(ords, pa.int32())}), idx


def cell_histogram(points: ray.data.Dataset, cell_level: int,
                   full_level: int) -> dict[int, int]:
    """Per-cell row counts (pre-aggregated per batch, combined driver-side
    — the skew detector)."""
    shift = 2 * (full_level - cell_level)

    def partial(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False) >> np.int64(shift)
        u, c = np.unique(cell, return_counts=True)
        return pa.table({"cell": pa.array(u), "n": pa.array(c.astype(np.int64))})

    out: dict[int, int] = {}
    for row in points.map_batches(partial, batch_format="pyarrow").take_all():
        out[row["cell"]] = out.get(row["cell"], 0) + row["n"]
    return out


def pip_join_cogroup(fixture_dir: str, regions: pa.Table,
                     cell_level: int = COGROUP_CELL_LEVEL,
                     full_level: int = 12,
                     hot_threshold: int = 50_000,
                     n_salt: int = 8) -> ray.data.Dataset:
    """(image_id, region_id) via explicit (cell, salt) co-partitioning."""
    import pickle

    region_cells, idx = _region_cell_table(regions, cell_level)
    rc_cell = region_cells.column("cell").to_numpy()
    shift = 2 * (full_level - cell_level)

    # per-region serialized geometry payload — travels on the region side
    # of the shuffle, one copy per exploded (cell, salt) row
    payloads = [
        pickle.dumps((idx.region_ids[i], idx.kinds[i],
                      tuple(float(v) for v in idx.bbox[i]),
                      int(idx.t_start_s[i]), int(idx.t_end_s[i]),
                      idx.polys[i], idx.lines[i], float(idx.line_buf[i])))
        for i in range(len(idx.region_ids))
    ]

    pts = read_images(fixture_dir, columns=["image_id", "phash"])
    pts = pts.map_batches(derive_and_encode, batch_format="pyarrow",
                          fn_kwargs={"cell_level": full_level})

    hist = cell_histogram(pts, cell_level, full_level)
    hot = {c for c, n in hist.items() if n > hot_threshold}

    # point side: (cell, salt, image_id, lon, lat, dtg_s)
    def key_points(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False) >> np.int64(shift)
        ph = batch.column("phash").to_numpy(zero_copy_only=False)
        salt = (splitmix64(ph.view(np.uint64) ^ np.uint64(0xABCD))
                % np.uint64(n_salt)).astype(np.int64)
        if hot:
            is_hot = np.isin(cell, np.array(sorted(hot), dtype=np.int64))
            salt = np.where(is_hot, salt, 0)
        else:
            salt = np.zeros(len(cell), dtype=np.int64)
        return pa.table({
            "ckey": pa.array(cell * np.int64(n_salt) + salt),
            "side": pa.array(np.zeros(len(cell), dtype=np.int8)),
            "image_id": batch.column("image_id"),
            "ord": pa.array(np.full(len(cell), -1, dtype=np.int32)),
            "lon": batch.column("lon"),
            "lat": batch.column("lat"),
            "dtg_s": batch.column("dtg_s"),
            "geom": pa.array([b""] * len(cell), pa.binary()),
        })

    # region side: replicate hot-cell rows to every salt, geometry aboard
    rcells = []
    rords = []
    rgeoms = []
    rc_ord = region_cells.column("ord").to_numpy()
    for c, o in zip(rc_cell.tolist(), rc_ord.tolist()):
        salts = range(n_salt) if c in hot else (0,)
        for s in salts:
            rcells.append(c * n_salt + s)
            rords.append(o)
            rgeoms.append(payloads[o])
    region_rows = pa.table({
        "ckey": pa.array(rcells, pa.int64()),
        "side": pa.array(np.ones(len(rcells), dtype=np.int8)),
        "image_id": pa.array([""] * len(rcells), pa.string()),
        "ord": pa.array(rords, pa.int32()),
        "lon": pa.array(np.zeros(len(rcells))),
        "lat": pa.array(np.zeros(len(rcells))),
        "dtg_s": pa.array(np.zeros(len(rcells), dtype=np.int64)),
        "geom": pa.array(rgeoms, pa.binary()),
    })

    both = pts.map_batches(key_points, batch_format="pyarrow") \
        .union(ray.data.from_arrow(region_rows))

    def cogroup_refine(group: pa.Table) -> pa.Table:
        import pickle as _pickle

        from geomesa_ray.geom.kernels import (
            dist_sq_to_polyline_deg,
            points_in_rings,
        )

        side = group.column("side").to_numpy(zero_copy_only=False)
        pts_t = group.filter(pa.array(side == 0))
        regs = group.filter(pa.array(side == 1))
        if pts_t.num_rows == 0 or regs.num_rows == 0:
            return pa.table({"image_id": pa.array([], pa.string()),
                             "region_id": pa.array([], pa.string())})
        lon = pts_t.column("lon").to_numpy(zero_copy_only=False)
        lat = pts_t.column("lat").to_numpy(zero_copy_only=False)
        dtg = pts_t.column("dtg_s").to_numpy(zero_copy_only=False)
        rords = regs.column("ord").to_numpy(zero_copy_only=False)
        geoms = regs.column("geom").to_pylist()
        # a region may reach this cell via two IDL parts — test it once
        _, first = np.unique(rords, return_index=True)
        ids = pts_t.column("image_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        out_p, out_r = [], []
        for gi in first:
            rid, kind, bbox, ts, te, polys, line, buf = _pickle.loads(geoms[gi])
            ok = (dtg >= ts) & (dtg <= te)
            if kind == "box":
                ok &= ((lon >= bbox[0]) & (lon <= bbox[1])
                       & (lat >= bbox[2]) & (lat <= bbox[3]))
            elif kind == "line":
                xs, ys = line
                ok &= dist_sq_to_polyline_deg(lon, lat, xs, ys) <= buf * buf
            else:
                inside = np.zeros(len(lon), dtype=bool)
                for rings in polys:
                    inside |= points_in_rings(lon, lat, rings)
                ok &= inside
            sel = np.nonzero(ok)[0]
            if len(sel):
                out_p.append(sel)
                out_r.extend([rid] * len(sel))
        if not out_p:
            return pa.table({"image_id": pa.array([], pa.string()),
                             "region_id": pa.array([], pa.string())})
        return pa.table({
            "image_id": ids.take(pa.array(np.concatenate(out_p))),
            "region_id": pa.array(out_r, pa.string()),
        })

    return both.groupby("ckey").map_groups(cogroup_refine, batch_format="pyarrow")
