"""Extent (non-point geometry) indexing + query via XZ2 keys.

Each image derives a deterministic ENVELOPE (phash-seeded center ±
phash-seeded half extents — the non-point-geometry analog of the point
derivation, SQL-reproducible integer->double math). The XZ2 key prunes
coarse candidates; the exact closed-interval overlap refines. The
driver's oracle is the plain overlap join, so the pruning stage is
verified LOSSLESS by the hash gate.

Reference parity: the XZ2 index is how GeoMesa stores line/polygon
features (``XZ2SFC`` / the xz2 index tables); this pipeline is its
query path re-expressed as one streaming ``map_batches`` pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from geomesa_ray.curve.xz2 import (
    MAX_XZ2_LEVEL,
    xz2_candidate_mask,
    xz2_encode,
    xz2_query_ranges,
)
from geomesa_ray.sources.io import read_images


def derive_extents(batch: pa.Table) -> pa.Table:
    """phash -> envelope columns (SQL-exact expression order):
    hw = ((phash >> 16) & 255) / 255.0 * 2.0 + 0.05
    hh = ((phash >> 24) & 255) / 255.0 * 1.0 + 0.05
    """
    from geomesa_ray.stages.derive import phash_to_lonlat

    ph = batch.column("phash").to_numpy(zero_copy_only=False)
    lon, lat = phash_to_lonlat(ph)  # no dtg columns — extents don't use them
    b = batch
    hw = ((ph >> np.int64(16)) & np.int64(255)).astype(np.float64) \
        / 255.0 * 2.0 + 0.05
    hh = ((ph >> np.int64(24)) & np.int64(255)).astype(np.float64) \
        / 255.0 * 1.0 + 0.05
    return pa.table({
        "image_id": b.column("image_id"),
        "lon_min": pa.array(lon - hw), "lon_max": pa.array(lon + hw),
        "lat_min": pa.array(lat - hh), "lat_max": pa.array(lat + hh),
    })


def wkt_envelopes(batch: pa.Table, id_col: str = "region_id",
                  wkt_col: str = "wkt") -> pa.Table:
    """USER-GEOMETRY adapter: (id, WKT) rows -> the extent store's
    canonical envelope schema (image_id, lon_min/max, lat_min/max).
    WKT parsing is per-row (converter-grade, like the reference's WKB
    attribute decoding) — geometry TABLES are region-scale, orders of
    magnitude smaller than the point corpus, so this is never the hot
    path. Envelope = min/max over every ring/part vertex."""
    from geomesa_ray.geom.wkt import parse_wkt_geometry

    ids = batch.column(id_col).to_pylist()
    x0 = np.empty(len(ids))
    x1 = np.empty(len(ids))
    y0 = np.empty(len(ids))
    y1 = np.empty(len(ids))
    for i, wkt in enumerate(batch.column(wkt_col).to_pylist()):
        kind, parts = parse_wkt_geometry(wkt)
        xs, ys = [], []
        if kind == "line":
            for px, py in parts:
                xs.append(px)
                ys.append(py)
        else:
            for ring_set in parts:
                for ring in ring_set:
                    xs.append(ring.xs)
                    ys.append(ring.ys)
        ax = np.concatenate(xs)
        ay = np.concatenate(ys)
        x0[i], x1[i] = ax.min(), ax.max()
        y0[i], y1[i] = ay.min(), ay.max()
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "lon_min": pa.array(x0), "lon_max": pa.array(x1),
        "lat_min": pa.array(y0), "lat_max": pa.array(y1),
    })


XZ2_PREFIX_LEVEL = 3  # partition granularity: <= 4^3 cells per level


def _xz2_partition_ids(level: np.ndarray, cell: np.ndarray,
                       prefix_level: int = XZ2_PREFIX_LEVEL) -> np.ndarray:
    """Composite partition id = level * 4^prefix + anchor-cell PREFIX —
    the XZ analog of the point store's bucket prefix; ids are a pure
    function of the data, never of the parallelism."""
    p = np.minimum(level, prefix_level)
    prefix = cell >> (2 * (level - p)).astype(np.int64)
    return level * np.int64(4 ** prefix_level) + prefix


def write_extent_store(fixture_dir: str, out_dir: str,
                       max_level: int = MAX_XZ2_LEVEL,
                       prefix_level: int = XZ2_PREFIX_LEVEL,
                       override_num_blocks: int | None = None,
                       extents: ray.data.Dataset | None = None) -> dict:
    """Materialize the extent table into an XZ2-partitioned store (the
    non-point analog of ``state.store.write_store``): ONE co-locating
    ``groupby(partition)`` shuffle, each partition TOTALLY ordered by
    (level, cell, image_id) — byte-deterministic rewrites — and
    committed through the shared partition protocol. The scheme is
    meta-guarded and committed partitions are filtered out BEFORE the
    shuffle, same resume semantics as the point store.

    ``extents``: a USER-SUPPLIED envelope dataset (columns image_id,
    lon_min/lon_max/lat_min/lat_max — adapt a WKT geometry table with
    :func:`wkt_envelopes`) indexes arbitrary geometries instead of the
    derived image envelopes — the general line/polygon ingest path the
    reference's XZ2 tables serve."""
    import json
    import os
    import tempfile

    import ray

    from geomesa_ray.state.manifest import (
        commit_partition,
        completed_partitions,
        skew_stats,
    )

    os.makedirs(out_dir, exist_ok=True)
    done = {int(b) for b in completed_partitions(out_dir)}
    scheme = {"kind": "xz2_extent", "max_level": max_level,
              "prefix_level": prefix_level,
              "source": "user" if extents is not None else "derived"}
    meta_path = os.path.join(out_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prev = json.load(f)
        if prev != scheme:
            raise ValueError(
                f"resume with different extent-store scheme {scheme} vs "
                f"committed {prev}; use the original parameters or a "
                "fresh output dir")
    elif done:
        raise ValueError(f"{out_dir} has partitions but no meta.json")
    else:
        fd, tmp = tempfile.mkstemp(dir=out_dir, prefix=".meta_")
        with os.fdopen(fd, "w") as f:
            json.dump(scheme, f)
        os.replace(tmp, meta_path)

    def keyed(batch: pa.Table) -> pa.Table:
        e = batch if extents is not None else derive_extents(batch)
        level, cell = xz2_encode(
            e.column("lon_min").to_numpy(zero_copy_only=False),
            e.column("lon_max").to_numpy(zero_copy_only=False),
            e.column("lat_min").to_numpy(zero_copy_only=False),
            e.column("lat_max").to_numpy(zero_copy_only=False), max_level)
        e = e.append_column("xz2_level", pa.array(level))
        e = e.append_column("xz2_cell", pa.array(cell))
        e = e.append_column(
            "part", pa.array(_xz2_partition_ids(level, cell, prefix_level)))
        if done:
            import pyarrow.compute as pc

            m = pc.is_in(e.column("part"),
                         value_set=pa.array(sorted(done), pa.int64()))
            e = e.filter(pc.invert(m))
        return e

    def write_part(group: pa.Table) -> pa.Table:
        pid = int(group.column("part")[0].as_py())
        g = group.sort_by([("xz2_level", "ascending"),
                           ("xz2_cell", "ascending"),
                           ("image_id", "ascending")])
        commit_partition(out_dir, pid, g, {"part": pid, "rows": g.num_rows})
        return pa.table({"part": pa.array([pid], pa.int64()),
                         "rows": pa.array([g.num_rows], pa.int64())})

    if extents is not None:
        ds = extents.select_columns(["image_id", "lon_min", "lon_max",
                                     "lat_min", "lat_max"])
    else:
        n_blocks = override_num_blocks or max(
            8, int(ray.cluster_resources().get("CPU", 8)))
        ds = read_images(fixture_dir, columns=["image_id", "phash"],
                         override_num_blocks=n_blocks)
    ds.map_batches(keyed, batch_format="pyarrow") \
        .groupby("part").map_groups(write_part, batch_format="pyarrow") \
        .count()
    return skew_stats(completed_partitions(out_dir))


def read_extent_store(out_dir: str, qbox,
                      max_level: int = MAX_XZ2_LEVEL,
                      prefix_level: int = XZ2_PREFIX_LEVEL):
    """Pruned extent query over the store: only partitions whose
    level+prefix can hold a candidate anchor are read, then the exact
    overlap refine — the XZ2 analog of the point store's pruned read.
    Returns (dataset of matching image_ids, partitions_read, total)."""
    import os

    import ray

    from geomesa_ray.state.manifest import completed_partitions

    q0, q1, q2, q3 = qbox
    plan = xz2_query_ranges(q0, q1, q2, q3, max_level)
    want = set()
    for lv, (los, his) in plan.items():
        p = min(lv, prefix_level)
        shift = 2 * (lv - p)
        for lo, hi in zip(los.tolist(), his.tolist()):
            for pref in range(lo >> shift, (hi >> shift) + 1):
                want.add(lv * (4 ** prefix_level) + pref)
    have = {int(b) for b in completed_partitions(out_dir)}
    read = sorted(want & have)
    if not read:
        return (ray.data.from_arrow(
            pa.table({"image_id": pa.array([], pa.string())})), 0, len(have))
    paths = [os.path.join(out_dir, f"part={b}", "data.parquet")
             for b in read]

    def refine(batch: pa.Table) -> pa.Table:
        level = batch.column("xz2_level").to_numpy(zero_copy_only=False)
        cell = batch.column("xz2_cell").to_numpy(zero_copy_only=False)
        coarse = xz2_candidate_mask(level, cell, plan)
        lon_min = batch.column("lon_min").to_numpy(zero_copy_only=False)
        lon_max = batch.column("lon_max").to_numpy(zero_copy_only=False)
        lat_min = batch.column("lat_min").to_numpy(zero_copy_only=False)
        lat_max = batch.column("lat_max").to_numpy(zero_copy_only=False)
        exact = ((lon_min <= q1) & (q0 <= lon_max)
                 & (lat_min <= q3) & (q2 <= lat_max))
        keep = coarse & exact
        return pa.table({
            "image_id": batch.column("image_id").filter(pa.array(keep))})

    import pyarrow.compute as pc

    # column projection + envelope filter: the overlap condition is part
    # of the exact test, so pushing it into the read prunes row groups
    # by parquet min/max stats before any decode
    expr = ((pc.field("lon_min") <= q1) & (pc.field("lon_max") >= q0)
            & (pc.field("lat_min") <= q3) & (pc.field("lat_max") >= q2))
    ds = ray.data.read_parquet(
        paths, filter=expr,
        columns=["image_id", "lon_min", "lon_max", "lat_min", "lat_max",
                 "xz2_level", "xz2_cell"],
    ).map_batches(refine, batch_format="pyarrow", batch_size=65536)
    return ds, len(read), len(have)


def xz2_extent_query(fixture_dir: str, qbox=(-10.0, 25.0, -5.0, 30.0),
                     max_level: int = MAX_XZ2_LEVEL) -> ray.data.Dataset:
    """image_ids whose ENVELOPE intersects the query box (closed
    intervals): XZ2 coarse prune -> exact overlap refine, one streaming
    pass. The candidate mask is provably a superset (enlarged-cell
    geometry), so the output equals the pure overlap join."""
    q0, q1, q2, q3 = qbox
    plan = xz2_query_ranges(q0, q1, q2, q3, max_level)

    def stage(batch: pa.Table) -> pa.Table:
        e = derive_extents(batch)
        lon_min = e.column("lon_min").to_numpy(zero_copy_only=False)
        lon_max = e.column("lon_max").to_numpy(zero_copy_only=False)
        lat_min = e.column("lat_min").to_numpy(zero_copy_only=False)
        lat_max = e.column("lat_max").to_numpy(zero_copy_only=False)
        level, cell = xz2_encode(lon_min, lon_max, lat_min, lat_max,
                                 max_level)
        coarse = xz2_candidate_mask(level, cell, plan)
        exact = ((lon_min <= q1) & (q0 <= lon_max)
                 & (lat_min <= q3) & (q2 <= lat_max))
        keep = coarse & exact
        return pa.table({
            "image_id": e.column("image_id").filter(pa.array(keep))})

    ds = read_images(fixture_dir, columns=["image_id", "phash"])
    return ds.map_batches(stage, batch_format="pyarrow", batch_size=65536)
