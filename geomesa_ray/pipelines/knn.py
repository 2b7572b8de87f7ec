"""k-nearest-neighbor join: every probe point finds its k closest images.

Reference parity: ``KNearestNeighborSearchProcess`` /
``KNNQuery.scala:26-101`` runs a geohash ring-expansion per probe with a
k-best priority queue and a kth-distance termination rule. The Ray-Data
shape replaces the sequential spiral with a two-stage exact computation:

1. **Partial top-k per batch** (``map_batches``, stateless, vectorized):
   for each probe, the batch's candidates with distance <= the batch's
   kth-smallest (ties included). This is the combiner — output is
   O(probes x k) per batch, so the shuffle stage moves a tiny skinny
   table no matter how large the input is.
2. **Final top-k** (``groupby(probe_id).map_groups``): exact global sort
   by (dist, image_id) per probe, head k — the analog of the reference's
   ``NearestNeighbors`` PQ merge, made deterministic by the id tie-break.

The planar metric's float expression matches the DuckDB oracle's op order
bit-for-bit, so ranks are exactly reproducible. A haversine variant covers
the reference's geodetic semantics (no SQL oracle; checked in pytest).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from geomesa_ray.geom.kernels import haversine_m
from geomesa_ray.sources.io import read_images
from geomesa_ray.stages.derive import derive_geometry


class _PartialTopK:
    """Per-batch combiner: emit each probe's local top-k candidate rows."""

    def __init__(self, plon, plat, pk, probe_ids, metric):
        self.plon = plon
        self.plat = plat
        self.pk = pk
        self.probe_ids = probe_ids
        self.metric = metric

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        ids = np.asarray(batch.column("image_id").to_pylist(), dtype=object)
        n = len(lon)
        out_pid, out_img, out_dist = [], [], []
        for p in range(len(self.plon)):
            if self.metric == "haversine":
                d = haversine_m(lon, lat, self.plon[p], self.plat[p])
            else:
                dx = lon - self.plon[p]
                dy = lat - self.plat[p]
                d = (dx * dx) + (dy * dy)
            k = int(self.pk[p])
            if n > k:
                thresh = np.partition(d, k - 1)[k - 1]
                cand = np.nonzero(d <= thresh)[0]
            else:
                cand = np.arange(n)
            out_pid.append(np.full(len(cand), self.probe_ids[p], dtype=object))
            out_img.append(ids[cand])
            out_dist.append(d[cand])
        return pa.table({
            "probe_id": pa.array(np.concatenate(out_pid).tolist(), pa.string()),
            "image_id": pa.array(np.concatenate(out_img).tolist(), pa.string()),
            "dist": pa.array(np.concatenate(out_dist)),
        })


def knn(fixture_dir: str, probes: pa.Table | None = None,
        metric: str = "planar") -> ray.data.Dataset:
    """Returns (probe_id, image_id, knn_rank) — rank 1..k per probe,
    ordered by (dist, image_id)."""
    if probes is None:
        probes = pq.read_table(os.path.join(fixture_dir, "probes.parquet"))
    plon = probes.column("lon").to_numpy()
    plat = probes.column("lat").to_numpy()
    pk = probes.column("k").to_numpy()
    pids = probes.column("probe_id").to_pylist()
    kmap = dict(zip(pids, pk.tolist()))

    ds = read_images(fixture_dir, columns=["image_id", "phash"])
    ds = ds.map_batches(derive_geometry, batch_format="pyarrow")
    partial = ds.map_batches(
        _PartialTopK, fn_constructor_args=(plon, plat, pk, pids, metric),
        batch_format="pyarrow", concurrency=(1, 8))

    def final_topk(group: pa.Table) -> pa.Table:
        pid = group.column("probe_id")[0].as_py()
        k = kmap[pid]
        d = group.column("dist").to_numpy()
        ids = np.asarray(group.column("image_id").to_pylist(), dtype=object)
        order = np.lexsort((ids, d))[:k]
        return pa.table({
            "probe_id": pa.array([pid] * len(order), pa.string()),
            "image_id": pa.array(ids[order].tolist(), pa.string()),
            "knn_rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        })

    return partial.groupby("probe_id").map_groups(final_topk, batch_format="pyarrow")
