"""Density (heat-map) and temporal-density aggregates.

Reference parity:
- Density: snap each point to a W x H pixel grid over an envelope and sum
  weights per cell, with per-scan partial maps merged client-side
  (``iterators/Z3DensityIterator.scala:38-147``, ``GridSnap.scala``,
  final reduce ``QueryPlanner.scala:376-390``).
- Temporal density: snap dtg into N buckets over an interval and count
  (``iterators/TemporalDensityIterator.scala:40-87``, ``TimeSnap.scala``).

Ray-Data shape: per-batch partial grids via np.unique (the combiner; a
batch of any size shrinks to <= W*H rows), then ONE final combine task
(``gather_combine``) — the result is bounded by the grid size, so an
all-to-all groupby shuffle would be pure overhead. Grid arithmetic uses
the same expression order as the DuckDB oracle SQL for exact parity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from geomesa_ray.sources.io import read_images, read_table
from geomesa_ray.stages.derive import derive_geometry
from geomesa_ray.util import gather_combine, unique_flat_sum


def _snap(vals: np.ndarray, lo: float, hi: float, n: int) -> np.ndarray:
    """px = min(floor((v - lo) / (hi - lo) * n), n-1); caller pre-filters
    v to [lo, hi]. Mirrored exactly in SQL."""
    px = np.floor((vals - lo) / (hi - lo) * float(n))
    return np.minimum(px, float(n - 1)).astype(np.int64)


def density(fixture_dir: str, bbox=(-180.0, 180.0, -90.0, 90.0),
            width: int = 360, height: int = 180,
            weighted: bool = False) -> ray.data.Dataset:
    """(px, py, weight) — per-pixel aggregate over the bbox: row count, or
    with ``weighted`` the sum of an integer per-row weight (phash & 15 —
    the reference's weight-attribute density, ``Z3DensityIterator`` weight
    option, in an exactly-SQL-reproducible integer domain)."""
    x0, x1, y0, y1 = bbox

    def partial(batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        m = (lon >= x0) & (lon <= x1) & (lat >= y0) & (lat <= y1)
        px = _snap(lon[m], x0, x1, width)
        py = _snap(lat[m], y0, y1, height)
        flat = py * width + px
        if weighted:
            w = (batch.column("phash").to_numpy(zero_copy_only=False)[m]
                 & np.int64(15))
            uniq, sums = unique_flat_sum(flat, w)
            return pa.table({"pix": pa.array(uniq), "weight": pa.array(sums)})
        uniq, cnt = np.unique(flat, return_counts=True)
        return pa.table({"pix": pa.array(uniq),
                         "weight": pa.array(cnt.astype(np.int64))})

    def final(batch: pa.Table) -> pa.Table:
        uniq, sums = unique_flat_sum(
            batch.column("pix").to_numpy(zero_copy_only=False),
            batch.column("weight").to_numpy(zero_copy_only=False))
        return pa.table({"px": pa.array(uniq % width),
                         "py": pa.array(uniq // width),
                         "weight": pa.array(sums)})

    ds = read_images(fixture_dir, columns=["phash"])
    ds = ds.map_batches(derive_geometry, batch_format="pyarrow", batch_size=65536)
    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return gather_combine(parts, final)


def temporal_density_images(fixture_dir: str, buckets: int = 96) -> ray.data.Dataset:
    """(bucket, weight) over the image corpus's derived dtg — integer
    bucket math over the fixed 4-week span (SQL-exact)."""
    from geomesa_ray.sources.fixtures import DTG_BASE_S, DTG_SPAN_S

    def partial(batch: pa.Table) -> pa.Table:
        dtg = batch.column("dtg_s").to_numpy(zero_copy_only=False)
        b = ((dtg - DTG_BASE_S) * buckets) // DTG_SPAN_S
        uniq, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(uniq),
                         "weight": pa.array(cnt.astype(np.int64))})

    def final(batch: pa.Table) -> pa.Table:
        uniq, sums = unique_flat_sum(
            batch.column("bucket").to_numpy(zero_copy_only=False),
            batch.column("weight").to_numpy(zero_copy_only=False))
        return pa.table({"bucket": pa.array(uniq), "weight": pa.array(sums)})

    ds = read_images(fixture_dir, columns=["phash"])
    ds = ds.map_batches(derive_geometry, batch_format="pyarrow", batch_size=65536)
    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return gather_combine(parts, final)


def user_window_counts(sf_dir: str, window_s: int = 86400,
                       n_parts: int = 64) -> ray.data.Dataset:
    """Per-key tumbling-window counts over the events stream table:
    (user_id, window_start, cnt). The batch expression of a streaming
    keyed window (ray_guide 'streaming-shaped workloads': ordered log +
    GROUP BY key, floor(ts/size)); watermarks are unnecessary in batch —
    late data is simply present.

    Per-batch combiner, then a hash-bucketed groupby merge: user
    cardinality is input-proportional (NOT bounded), so the final merge
    shuffles by ``hash(user_id) % n_parts`` and each of the ``n_parts``
    tasks merges only its bucket — no single-task combine, no driver
    state. Keys stay as (user_id, window_start) column pairs (a packed
    scalar key would wrap for user_id >= 2^31)."""
    from geomesa_ray.sources.fixtures import splitmix64
    from geomesa_ray.util import unique_rows_sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        win = (ts // (window_s * 1_000_000)) * window_s
        (u, w), cnt = unique_rows_sum([uid, win],
                                      np.ones(len(uid), dtype=np.int64))
        part = (splitmix64(u.view(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "user_id": pa.array(u),
            "window_start": pa.array(w),
            "cnt": pa.array(cnt),
            "part": pa.array(part),
        })

    def merge(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").to_numpy(zero_copy_only=False)
        win = group.column("window_start").to_numpy(zero_copy_only=False)
        cnt = group.column("cnt").to_numpy(zero_copy_only=False)
        (u, w), s = unique_rows_sum([uid, win], cnt)
        return pa.table({"user_id": pa.array(u), "window_start": pa.array(w),
                         "cnt": pa.array(s)})

    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])
    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return parts.groupby("part").map_groups(merge, batch_format="pyarrow")


def temporal_density(sf_dir: str, t0_us: int, t1_us: int,
                     buckets: int = 96) -> ray.data.Dataset:
    """(bucket, weight) — event count per time bucket over [t0, t1).

    Runs over the driver's ``events`` table (ts column); integer bucket
    math: ((epoch_us - t0) * buckets) // (t1 - t0).
    """
    span = t1_us - t0_us

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = (ts >= t0_us) & (ts < t1_us)
        b = ((ts[m] - t0_us) * buckets) // span
        uniq, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(uniq),
                         "weight": pa.array(cnt.astype(np.int64))})

    def final(batch: pa.Table) -> pa.Table:
        uniq, sums = unique_flat_sum(
            batch.column("bucket").to_numpy(zero_copy_only=False),
            batch.column("weight").to_numpy(zero_copy_only=False))
        return pa.table({"bucket": pa.array(uniq), "weight": pa.array(sums)})

    ds = read_table(sf_dir, "events", columns=["ts"])
    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return gather_combine(parts, final)


def z3_histogram(fixture_dir: str, prefix_bits: int = 12) -> ray.data.Dataset:
    """Spatio-temporal histogram over coarse Z3 prefixes — the
    ``Z3Histogram`` stat role (later-GeoMesa stats service; this
    reference era exposes only the density iterator): counts per
    (week, z3 >> (63 - prefix_bits)), i.e. one bin per coarse
    space-time octant. The same pre-aggregated combiner shape as
    :func:`density` — per-batch unique+count, one bounded combine —
    so the shuffle carries at most 2^prefix_bits rows per block
    regardless of input size. DuckDB-oracle-able via the shared
    z3 SQL twin (cross-checked in tests)."""
    from geomesa_ray.stages.encode import derive_and_encode

    shift = np.int64(63 - prefix_bits)

    def partial(batch: pa.Table) -> pa.Table:
        week = batch.column("week").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        z3 = batch.column("z3").to_numpy(zero_copy_only=False)
        # prefix occupies exactly prefix_bits, so (week << prefix_bits)
        # never collides — and never overflows int64 (week << 52 would,
        # past week 2048)
        key = (week << np.int64(prefix_bits)) | (z3 >> shift)
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    def final(batch: pa.Table) -> pa.Table:
        uniq, sums = unique_flat_sum(
            batch.column("key").to_numpy(zero_copy_only=False),
            batch.column("cnt").to_numpy(zero_copy_only=False))
        return pa.table({
            "week": pa.array(uniq >> np.int64(prefix_bits)),
            "z3_prefix": pa.array(
                uniq & ((np.int64(1) << np.int64(prefix_bits)) - 1)),
            "cnt": pa.array(sums),
        })

    ds = read_images(fixture_dir, columns=["phash"])
    ds = ds.map_batches(derive_and_encode, batch_format="pyarrow",
                        batch_size=65536)
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
    return gather_combine(parts, final)
