"""k-nearest-neighbor join: every probe point finds its k closest images.

Reference parity: ``KNearestNeighborSearchProcess`` /
``KNNQuery.scala:26-101`` runs a geohash ring-expansion per probe with a
k-best priority queue and a kth-distance termination rule. The Ray-Data
shape replaces the sequential spiral with a two-stage exact computation:

1. **Partial top-k per batch** (task-based ``map_batches``, fully
   vectorized P x B distance matrix): each probe keeps the batch's
   candidates with distance <= the batch's kth-smallest (ties included).
   Output is O(probes x k) per batch — the shuffle-avoiding combiner.
2. **Final top-k**: the partials are bounded (probes x k x n_batches
   skinny rows), so ONE final combine task does the exact global sort by
   (dist, image_id) per probe — the analog of the reference's
   ``NearestNeighbors`` PQ merge, deterministic via the id tie-break.

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
from geomesa_ray.util import gather_combine


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
    pid_lookup = pa.array(pids, pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        n = len(lon)
        if metric == "haversine":
            d = haversine_m(lon[None, :], lat[None, :],
                            plon[:, None], plat[:, None])
        else:
            dx = lon[None, :] - plon[:, None]
            dy = lat[None, :] - plat[:, None]
            d = (dx * dx) + (dy * dy)  # (P, B)
        out_p, out_i, out_d = [], [], []
        for p in range(len(plon)):
            dp = d[p]
            k = int(pk[p])
            if n > k:
                thresh = np.partition(dp, k - 1)[k - 1]
                cand = np.nonzero(dp <= thresh)[0]
            else:
                cand = np.arange(n)
            out_p.append(np.full(len(cand), p, dtype=np.int64))
            out_i.append(cand)
            out_d.append(dp[cand])
        pidx = np.concatenate(out_p)
        idx = np.concatenate(out_i)
        ids = batch.column("image_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            "probe_idx": pa.array(pidx),
            "image_id": ids.take(pa.array(idx)),
            "dist": pa.array(np.concatenate(out_d)),
        })

    def final(batch: pa.Table) -> pa.Table:
        pidx = batch.column("probe_idx").to_numpy(zero_copy_only=False)
        dist = batch.column("dist").to_numpy(zero_copy_only=False)
        ids = np.asarray(batch.column("image_id").to_pylist(), dtype=object)
        out_p, out_i, out_r = [], [], []
        for p in np.unique(pidx):
            sel = np.nonzero(pidx == p)[0]
            order = np.lexsort((ids[sel], dist[sel]))[: int(pk[p])]
            take = sel[order]
            out_p.append(np.full(len(take), p, dtype=np.int64))
            out_i.append(ids[take])
            out_r.append(np.arange(1, len(take) + 1, dtype=np.int64))
        pidx_f = np.concatenate(out_p)
        return pa.table({
            "probe_id": pid_lookup.take(pa.array(pidx_f)),
            "image_id": pa.array(np.concatenate(out_i).tolist(), pa.string()),
            "knn_rank": pa.array(np.concatenate(out_r)),
        })

    ds = read_images(fixture_dir, columns=["image_id", "phash"])
    ds = ds.map_batches(derive_geometry, batch_format="pyarrow")
    parts = ds.map_batches(partial, batch_format="pyarrow")
    return gather_combine(parts, final)
