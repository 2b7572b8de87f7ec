"""Proximity (within-distance) join and the unique-union helper.

Reference parity: ``ProximitySearchProcess.scala:28-60`` buffers input
features by d meters and runs a within-distance join against the store.
Ray-Data shape: the probe side is small -> broadcast; candidate prune by
bbox expanded by the degree-equivalent of d (the reference's
meters->degrees rewrite, ``FilterHelper.scala:104-116``), exact refine by
haversine. One streaming pass, zero shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from geomesa_ray.geom.kernels import haversine_m
from geomesa_ray.sources.io import read_images
from geomesa_ray.stages.derive import derive_geometry
from geomesa_ray.util import resolve_broadcast

METERS_PER_DEGREE_LAT = 110_574.0  # meridian degree


def proximity_join(fixture_dir: str, probes_lon: np.ndarray,
                   probes_lat: np.ndarray, probe_ids: list[str],
                   dist_m: float) -> ray.data.Dataset:
    """(probe_id, image_id, dist_m) for every image within dist_m of a
    probe point (haversine-exact refine; CONSERVATIVE bbox prescreen).

    Prescreen bounds must be a superset of the true circle: the lat bound
    uses the meridian degree with slop; the lon bound evaluates the
    parallel's shrink at the WORST latitude the circle reaches (not the
    probe's own latitude — a circle's max lon delta occurs poleward of
    the center), with slop; circles reaching a pole drop the lon bound
    entirely. Exactness comes from the haversine refine.
    """
    probes_lat = np.asarray(probes_lat, dtype=np.float64)
    dlat = (dist_m / METERS_PER_DEGREE_LAT) * 1.05
    worst_lat = np.minimum(np.abs(probes_lat) + dlat, 89.999)
    near_pole = (np.abs(probes_lat) + dlat) >= 89.0
    coslat = np.cos(np.radians(worst_lat))
    dlon = np.where(
        near_pole, 360.0,
        np.minimum((dist_m / (METERS_PER_DEGREE_LAT * np.maximum(coslat, 1e-9)))
                   * 1.05, 360.0))
    ref = ray.put((np.asarray(probes_lon), probes_lat,
                   np.asarray(dlat), np.asarray(dlon), list(probe_ids)))

    def probe(batch: pa.Table) -> pa.Table:
        plon, plat, dla, dlo, pids = resolve_broadcast(ref)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        out_p, out_i, out_d = [], [], []
        for p in range(len(plon)):
            # antimeridian-safe lon delta: wrap into [-180, 180)
            dlon_w = np.abs(((lon - plon[p] + 180.0) % 360.0) - 180.0)
            cand = np.nonzero((np.abs(lat - plat[p]) <= dla)
                              & (dlon_w <= dlo[p]))[0]
            if len(cand) == 0:
                continue
            d = haversine_m(lon[cand], lat[cand], plon[p], plat[p])
            keep = d <= dist_m
            out_p.append(np.full(keep.sum(), p, dtype=np.int64))
            out_i.append(cand[keep])
            out_d.append(d[keep])
        if not out_p:
            return pa.table({"probe_id": pa.array([], pa.string()),
                             "image_id": pa.array([], pa.string()),
                             "dist_m": pa.array([], pa.float64())})
        pidx = np.concatenate(out_p)
        idx = np.concatenate(out_i)
        ids = batch.column("image_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        plook = pa.array(pids, pa.string())
        return pa.table({
            "probe_id": plook.take(pa.array(pidx)),
            "image_id": ids.take(pa.array(idx)),
            "dist_m": pa.array(np.concatenate(out_d)),
        })

    ds = read_images(fixture_dir, columns=["image_id", "phash"])
    ds = ds.map_batches(derive_geometry, batch_format="pyarrow")
    return ds.map_batches(probe, batch_format="pyarrow")


def unique_union(datasets: list[ray.data.Dataset],
                 id_col: str = "image_id") -> ray.data.Dataset:
    """De-duplicating union of result sets (reference
    ``UniqueMultiCollection``, used by tube-select): union + keep-first
    per id. Result sets here are query outputs (small relative to the
    corpus) -> one combine task; switch to a groupby(id) shuffle if a
    union ever exceeds one block."""
    from geomesa_ray.util import gather_combine

    ds = datasets[0]
    for other in datasets[1:]:
        ds = ds.union(other)

    def drop_dupes(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        seen = np.asarray(ids.to_pylist(), dtype=object)
        _, first = np.unique(seen, return_index=True)
        return batch.take(pa.array(np.sort(first)))

    return gather_combine(ds, drop_dupes)


def id_setop(datasets: list[ray.data.Dataset], id_col: str = "image_id",
             require: int | None = None,
             n_parts: int = 64) -> ray.data.Dataset:
    """Distributed id-set algebra over k result streams — UNION-DISTINCT
    (``require=1``) or INTERSECTION (``require=k``, the default) —
    with NO driver materialization: each stream's ids are tagged with
    the stream index, the union is bucketed by an id hash, and each
    bucket keeps the ids seen in >= ``require`` DISTINCT streams. One
    bucketed groupby regardless of k; duplicate ids within a stream are
    collapsed by the distinct-tag count, so the output is also distinct.
    This is the scale-safe composition for CQL AND/OR over branch
    queries whose result sizes are corpus-proportional."""
    from geomesa_ray.stages.sketches import _hash_string_array

    k = len(datasets)
    if require is None:
        require = k
    if k == 1 and require <= 1:
        return unique_union(datasets, id_col)

    def tag(i: int):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col)
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            h = _hash_string_array(ids)
            part = (h % np.uint64(n_parts)).astype(np.int64)
            return pa.table({
                id_col: ids,
                "branch": pa.array(np.full(len(ids), i, dtype=np.int64)),
                "part": pa.array(part),
            })
        return fn

    u = datasets[0].map_batches(tag(0), batch_format="pyarrow")
    for i, other in enumerate(datasets[1:], start=1):
        u = u.union(other.map_batches(tag(i), batch_format="pyarrow"))

    def keep_ids(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column(id_col).to_pylist(), dtype=object)
        br = group.column("branch").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(ids, return_inverse=True)
        # distinct (id, branch) rows -> per-id distinct-branch count
        pairs = np.unique(np.stack([inv, br], axis=1), axis=0)
        cnt = np.bincount(pairs[:, 0], minlength=len(uniq))
        hit = uniq[cnt >= require]
        return pa.table({id_col: pa.array(hit.tolist(), pa.string())})

    return u.groupby("part").map_groups(keep_ids, batch_format="pyarrow")
