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
