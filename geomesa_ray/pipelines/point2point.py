"""Point-to-point track building: aggregate point observations into
consecutive line segments per track.

Reference parity (``geomesa-process/src/main/scala/org/locationtech/
geomesa/process/Point2PointProcess.scala:27-113``): group the input by a
track attribute, drop groups with <= ``min_points`` observations, sort
each group by its time attribute, optionally break connections on day
boundaries (day groups need >= 2 points — a 1-point day yields no
segment), then emit one 2-point line segment per consecutive pair with
(group, sort_start, sort_end) attributes and a per-run segment index;
``filter_singular`` drops zero-length segments (both endpoints equal,
the reference's ``orthodromicDistance > 0`` test — distance is zero iff
the coordinates coincide, so no geodesic math is needed to decide it).

Two deliberate determinism deviations from the reference, both
documented here because the reference's choices are not reproducible in
a distributed engine: ties on the sort time are broken by ``image_id``
(the reference relies on Scala's stable sort over an unspecified input
order), and "day" is the UTC day ``dtg_s // 86400`` (the reference uses
Joda ``dayOfYear`` in the JVM default time zone).

Ray-Data shape: tracks are hash-bucketed into ``n_parts`` partitions
(every row of a track lands in one bucket, so the ``min_points`` total
count is computable inside the bucket task), then ONE vectorized pass
per bucket: ``np.lexsort`` by (track, time, id), run boundaries from
array diffs, segments = adjacent-row pairs within a run. No per-group
Python loop, no driver materialization; segment output streams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from geomesa_ray.sources.io import read_images
from geomesa_ray.stages.derive import derive_geometry

SECONDS_PER_DAY = 86400


def build_segments(ds: ray.data.Dataset, *, group_col: str = "track",
                   sort_col: str = "dtg_s", id_col: str = "image_id",
                   min_points: int = 2, break_on_day: bool = False,
                   filter_singular: bool = True,
                   n_parts: int = 64) -> ray.data.Dataset:
    """Core operator over any dataset with (group_col:int64,
    sort_col:int64 seconds, lon, lat, id_col) columns. Returns
    (track, seg_idx, t_start, t_end, x0, y0, x1, y1)."""
    from geomesa_ray.sources.fixtures import splitmix64

    def add_part(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        part = (splitmix64(g.view(np.uint64))
                % np.uint64(n_parts)).astype(np.int64)
        return batch.append_column("part", pa.array(part))

    def segments(group: pa.Table) -> pa.Table:
        g = group.column(group_col).to_numpy(zero_copy_only=False)
        t = group.column(sort_col).to_numpy(zero_copy_only=False)
        lon = group.column("lon").to_numpy(zero_copy_only=False)
        lat = group.column("lat").to_numpy(zero_copy_only=False)
        rid = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((rid, t, g))
        g, t, lon, lat = g[order], t[order], lon[order], lat[order]
        n = len(g)
        empty = pa.table({
            "track": pa.array([], pa.int64()),
            "seg_idx": pa.array([], pa.int64()),
            "t_start": pa.array([], pa.int64()),
            "t_end": pa.array([], pa.int64()),
            "x0": pa.array([], pa.float64()),
            "y0": pa.array([], pa.float64()),
            "x1": pa.array([], pa.float64()),
            "y1": pa.array([], pa.float64()),
        })
        if n < 2:
            return empty
        # min_points is a TOTAL-group-size filter (strict >, reference
        # `coll.size > minPoints`), applied before any day split
        _, inv, cnt = np.unique(g, return_inverse=True, return_counts=True)
        keep_row = cnt[inv] > min_points
        # adjacency: rows i and i+1 form a segment iff same track run
        same = (g[1:] == g[:-1]) & keep_row[1:]
        if break_on_day:
            day = t // SECONDS_PER_DAY
            same &= day[1:] == day[:-1]
        # seg_idx restarts at every run boundary (reference zipWithIndex
        # per day group / per whole group): cumulative count of valid
        # segments since the last invalid adjacency
        idx = np.zeros(n - 1, dtype=np.int64)
        if same.any():
            c = np.cumsum(same.astype(np.int64))
            # subtract the cumsum value at the last reset before each row
            reset = np.where(~same, c, 0)
            run_base = np.maximum.accumulate(reset)
            idx = c - run_base - 1
        valid = same
        if filter_singular:
            valid = valid & ((lon[1:] != lon[:-1]) | (lat[1:] != lat[:-1]))
        if not valid.any():
            return empty
        i = np.nonzero(valid)[0]
        return pa.table({
            "track": pa.array(g[i]),
            "seg_idx": pa.array(idx[i]),
            "t_start": pa.array(t[i]),
            "t_end": pa.array(t[i + 1]),
            "x0": pa.array(lon[i]),
            "y0": pa.array(lat[i]),
            "x1": pa.array(lon[i + 1]),
            "y1": pa.array(lat[i + 1]),
        })

    parts = ds.map_batches(add_part, batch_format="pyarrow")
    return parts.groupby("part").map_groups(segments, batch_format="pyarrow")


def add_track(batch: pa.Table) -> pa.Table:
    """Track key for the image corpus: byte 6 of the phash (256 synthetic
    camera tracks) — SQL-mirrorable as ``(phash >> 48) & 255`` (DuckDB
    and NumPy both arithmetic-shift signed int64, verified)."""
    ph = batch.column("phash").to_numpy(zero_copy_only=False)
    track = (ph >> np.int64(48)) & np.int64(255)
    return batch.append_column("track", pa.array(track))


def point2point(fixture_dir: str, *, min_points: int = 2,
                break_on_day: bool = True, filter_singular: bool = True,
                n_parts: int = 64) -> ray.data.Dataset:
    """Point2PointProcess over the image corpus: observations are the
    phash-derived (lon, lat, dtg_s) points, tracks are the 256 phash-
    byte-6 classes."""
    ds = read_images(fixture_dir, columns=["image_id", "phash"])
    ds = ds.map_batches(derive_geometry, batch_format="pyarrow")
    ds = ds.map_batches(add_track, batch_format="pyarrow")
    ds = ds.map_batches(
        lambda b: b.select(["image_id", "track", "dtg_s", "lon", "lat"]),
        batch_format="pyarrow")
    return build_segments(ds, min_points=min_points,
                          break_on_day=break_on_day,
                          filter_singular=filter_singular, n_parts=n_parts)
