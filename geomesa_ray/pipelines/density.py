"""Density (heat-map) and temporal-density aggregates.

Reference parity:
- Density: snap each point to a W x H pixel grid over an envelope and sum
  weights per cell, with per-scan partial maps merged at the end
  (``iterators/Z3DensityIterator.scala:38-147``, ``GridSnap.scala``).
  Ray-Data shape: per-batch partial grids via np.bincount (the combiner),
  then a small ``groupby(px, py).sum`` over pre-aggregated partials —
  the shuffle moves at most W*H rows per batch, not the input.
- Temporal density: snap dtg into N buckets over an interval and count
  (``iterators/TemporalDensityIterator.scala:40-87``, ``TimeSnap.scala``).

Grid arithmetic uses the same expression order as the DuckDB oracle SQL
(integer bucket math for time; float-floor for pixels) for exact parity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from geomesa_ray.sources.io import read_images, read_table
from geomesa_ray.stages.derive import derive_geometry


def _snap(vals: np.ndarray, lo: float, hi: float, n: int) -> np.ndarray:
    """px = min(floor((v - lo) / (hi - lo) * n), n-1); caller pre-filters
    v to [lo, hi]. Mirrored exactly in SQL."""
    px = np.floor((vals - lo) / (hi - lo) * float(n))
    return np.minimum(px, float(n - 1)).astype(np.int64)


def density(fixture_dir: str, bbox=(-180.0, 180.0, -90.0, 90.0),
            width: int = 360, height: int = 180) -> ray.data.Dataset:
    """(px, py, weight) — count of images per grid pixel over the bbox."""
    x0, x1, y0, y1 = bbox

    def partial(batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        m = (lon >= x0) & (lon <= x1) & (lat >= y0) & (lat <= y1)
        px = _snap(lon[m], x0, x1, width)
        py = _snap(lat[m], y0, y1, height)
        flat = py * width + px
        uniq, cnt = np.unique(flat, return_counts=True)
        return pa.table({
            "px": pa.array(uniq % width),
            "py": pa.array(uniq // width),
            "weight": pa.array(cnt.astype(np.int64)),
        })

    ds = read_images(fixture_dir, columns=["phash"])
    ds = ds.map_batches(derive_geometry, batch_format="pyarrow")
    parts = ds.map_batches(partial, batch_format="pyarrow")
    agg = parts.groupby(["px", "py"]).sum("weight")
    return agg.map_batches(
        lambda b: b.rename_columns(["px", "py", "weight"]),
        batch_format="pyarrow")


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

    ds = read_table(sf_dir, "events", columns=["ts"])
    parts = ds.map_batches(partial, batch_format="pyarrow")
    agg = parts.groupby("bucket").sum("weight")
    return agg.map_batches(lambda b: b.rename_columns(["bucket", "weight"]),
                           batch_format="pyarrow")
