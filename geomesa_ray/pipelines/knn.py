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

import ray
import ray.data

from geomesa_ray.geom.kernels import haversine_m
from geomesa_ray.sources.io import read_images
from geomesa_ray.stages.derive import derive_geometry
from geomesa_ray.util import gather_combine, resolve_broadcast


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


def knn_indexed(store_dir: str, probes: pa.Table | None = None,
                fixture_dir: str | None = None,
                metric: str = "planar", ring_step: int = 2,
                probe_wave_size: int = 8192,
                merge_gather_threshold: int = 512) -> pa.Table:
    """Index-pruned kNN over a SpatialStore: per-probe ring expansion on
    the bucket grid with the reference's termination rule — stop when the
    unread rings' minimum possible distance exceeds the kth-best distance
    (``KNNQuery.scala:56-81`` spiral + ``GeoHashSpiral`` enumeration,
    re-expressed as batched ring reads).

    Each iteration does ONE pruned DISTRIBUTED ``ray.data.read_parquet``
    of the newly-needed partitions for all still-active probes (never
    re-reading a bucket, partitions never loaded on the driver), and each
    read batch runs ONE vectorized (active-probes x rows) distance pass
    that emits per-probe partial top-k rows. The partials merge into the
    per-probe candidate state in a DISTRIBUTED ``groupby(part-of-probe)``
    stage (state = a bounded materialized Dataset of ranked candidate
    rows, <= probes x (k + kth-ties)); the driver reads back ONLY the
    rank-k row per probe — the kth distance its termination rule needs —
    plus the final result. Exactly matches the full-scan planar ``knn()``
    (verified in tests, incl. a 10^3-probe run). Returns an arrow Table.

    Probe sets beyond ``probe_wave_size`` run as sequential WAVES: the
    per-batch distance matrix is (active x batch_rows), so an unbounded
    probe count would blow worker memory; waving bounds it at
    wave x 65536 doubles per task while keeping each wave's partition
    pruning intact (buckets may be re-read across waves — the honest
    cost of bounding memory).
    """
    import os

    from geomesa_ray.state.store import completed_partitions, read_meta

    if probes is None:
        probes = pq.read_table(os.path.join(fixture_dir, "probes.parquet"))
    if probes.num_rows > probe_wave_size:
        parts = [
            knn_indexed(store_dir,
                        probes=probes.slice(s, probe_wave_size),
                        metric=metric, ring_step=ring_step,
                        probe_wave_size=probe_wave_size,
                        merge_gather_threshold=merge_gather_threshold)
            for s in range(0, probes.num_rows, probe_wave_size)
        ]
        return pa.concat_tables(parts)
    meta = read_meta(store_dir)
    blevel = meta["bucket_level"]
    n_salt = meta.get("n_salt", 1) if meta.get("salted") else 1
    nx = 1 << blevel
    cell_w = 360.0 / nx
    cell_h = 180.0 / nx
    min_cell = min(cell_w, cell_h)

    plon = probes.column("lon").to_numpy()
    plat = probes.column("lat").to_numpy()
    pk = probes.column("k").to_numpy()
    pids = probes.column("probe_id").to_pylist()
    npr = len(pids)

    from geomesa_ray.curve.sfc import lonlat_to_xy
    from geomesa_ray.curve.zorder import U, z2_encode

    px, py = lonlat_to_xy(plon, plat, blevel, blevel)
    existing = {int(b) for b in completed_partitions(store_dir)}

    # distributed candidate state: (aidx, image_id, dist, rank, part)
    # rows, <= k + kth-ties per probe, hash-bucketed by probe — merged
    # in a groupby stage each iteration, never gathered on the driver
    state: ray.data.Dataset | None = None
    kth_of: dict[int, float] = {}  # rank-k distance per filled probe
    n_parts = 16
    pk_i64 = pk.astype(np.int64)

    def merge_topk(group: pa.Table) -> pa.Table:
        """Per-probe exact merge: sort by (dist, id), keep k + kth-dist
        ties, emit rank 1..n — vectorized over the group's probes. The
        sort runs in Arrow's C++ kernel (the ids are ASCII, where
        Arrow's bytewise string order equals Python's code-point order
        — the tie-break contract shared with the full-scan knn())."""
        g = group.sort_by([("aidx", "ascending"), ("dist", "ascending"),
                           ("image_id", "ascending")])
        aidx = g.column("aidx").to_numpy(zero_copy_only=False)
        dist = g.column("dist").to_numpy(zero_copy_only=False)
        ids_col = g.column("image_id")
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        starts = np.nonzero(np.diff(aidx, prepend=aidx[0] - 1))[0] \
            if len(aidx) else np.empty(0, np.int64)
        keep_idx, ranks = [], []
        ends = np.append(starts[1:], len(aidx))
        for s, e in zip(starts, ends):
            k = int(pk_i64[aidx[s]])
            cut = e - s
            if cut > k:
                kd = dist[s + k - 1]
                cut = k
                while s + cut < e and dist[s + cut] == kd:
                    cut += 1
            keep_idx.append(np.arange(s, s + cut))
            ranks.append(np.arange(1, cut + 1, dtype=np.int64))
        if not keep_idx:
            return pa.table({"aidx": pa.array([], pa.int64()),
                             "image_id": pa.array([], pa.string()),
                             "dist": pa.array([], pa.float64()),
                             "rank": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int64())})
        sel = np.concatenate(keep_idx)
        return pa.table({
            "aidx": pa.array(aidx[sel]),
            "image_id": ids_col.take(pa.array(sel)),
            "dist": pa.array(dist[sel]),
            "rank": pa.array(np.concatenate(ranks)),
            "part": pa.array(aidx[sel] % np.int64(n_parts)),
        })

    read_buckets: set[int] = set()
    active = set(range(npr))
    ring = 0
    max_ring = nx  # covers the whole grid (with lon wrap)

    def ring_offsets(r_lo: int, r_hi: int) -> tuple[np.ndarray, np.ndarray]:
        """(dx, dy) offsets of every cell on rings r_lo..r_hi (chebyshev
        shells), as two int64 arrays — built once per iteration."""
        dxs, dys = [], []
        for r in range(r_lo, r_hi + 1):
            if r == 0:
                dxs.append(np.zeros(1, np.int64))
                dys.append(np.zeros(1, np.int64))
                continue
            side = np.arange(-r, r + 1, dtype=np.int64)
            mid = np.arange(-r + 1, r, dtype=np.int64)
            dxs += [side, side,
                    np.full(len(mid), -r, np.int64),
                    np.full(len(mid), r, np.int64)]
            dys += [np.full(len(side), -r, np.int64),
                    np.full(len(side), r, np.int64), mid, mid]
        return np.concatenate(dxs), np.concatenate(dys)

    def ring_cells_all(act: np.ndarray, r_lo: int, r_hi: int) -> set[int]:
        """Needed cells for ALL active probes over rings r_lo..r_hi in
        one vectorized pass (lon wraps, lat clips) — the driver's
        planning loop stays O(probes x ring_cells) numpy, never
        per-probe Python (round 5: at 2000 probes the per-probe set
        loop with scalar z2_encode dominated the driver)."""
        dx, dy = ring_offsets(r_lo, r_hi)
        xx = (px[act][:, None] + dx[None, :]) % nx
        yy = py[act][:, None] + dy[None, :]
        ok = (yy >= 0) & (yy < nx)
        cells = z2_encode(xx[ok].astype(np.uint64),
                          yy[ok].astype(np.uint64))
        return set(np.unique(cells.view(np.int64)).tolist())

    while active and ring <= max_ring:
        # read ``ring_step`` rings per iteration: each iteration pays a
        # fixed distributed-read scheduling cost, and most probes
        # terminate within a couple of rings — stepping 2 halves the
        # driver-serialized iteration count for a marginal extra read
        ring_hi = min(ring + ring_step - 1, max_ring)
        needed = ring_cells_all(np.array(sorted(active), dtype=np.int64),
                                ring, ring_hi)
        # salted layout: expand each cell bucket to its salt partitions
        needed = {c * n_salt + s for c in needed for s in range(n_salt)}
        new = (needed & existing) - read_buckets
        read_buckets |= needed
        if new:
            paths = [os.path.join(store_dir, f"part={b}", "data.parquet")
                     for b in sorted(new)]
            act = np.array(sorted(active), dtype=np.int64)
            ref = ray.put((plon[act], plat[act],
                           pk[act].astype(np.int64), act))

            def ring_partial(batch: pa.Table) -> pa.Table:
                alon, alat, apk, act_ = resolve_broadcast(ref)
                lon = batch.column("lon").to_numpy(zero_copy_only=False)
                lat = batch.column("lat").to_numpy(zero_copy_only=False)
                n = len(lon)
                # probe-chunked distance pass: a full (active x rows)
                # matrix at thousands of active probes is hundreds of
                # MB PER TASK x 32 concurrent tasks — measured 5-15x
                # wall-time swings from the resulting memory thrash.
                # Chunking probes bounds each temporary to ~32 MB while
                # keeping the per-batch output identical.
                chunk = max(64, 4_000_000 // max(n, 1))
                out_a, out_i, out_d = [], [], []
                for c0 in range(0, len(alon), chunk):
                    c1 = min(c0 + chunk, len(alon))
                    if metric == "haversine":
                        d = haversine_m(lon[None, :], lat[None, :],
                                        alon[c0:c1, None],
                                        alat[c0:c1, None])
                    else:
                        dx = lon[None, :] - alon[c0:c1, None]
                        dy = lat[None, :] - alat[c0:c1, None]
                        d = (dx * dx) + (dy * dy)  # (chunk, B)
                    for ai in range(c0, c1):
                        da = d[ai - c0]
                        k = int(apk[ai])
                        if n > k:
                            thresh = np.partition(da, k - 1)[k - 1]
                            sel = np.nonzero(da <= thresh)[0]
                        else:
                            sel = np.arange(n)
                        out_a.append(np.full(len(sel), act_[ai],
                                             dtype=np.int64))
                        out_i.append(sel)
                        out_d.append(da[sel])
                ids_col = batch.column("image_id")
                if isinstance(ids_col, pa.ChunkedArray):
                    ids_col = ids_col.combine_chunks()
                aidx = np.concatenate(out_a)
                return pa.table({
                    "aidx": pa.array(aidx),
                    "image_id": ids_col.take(pa.array(np.concatenate(out_i))),
                    "dist": pa.array(np.concatenate(out_d)),
                    "rank": pa.array(np.zeros(len(aidx), np.int64)),
                    "part": pa.array(aidx % np.int64(n_parts)),
                })

            # coalesce small partition files into ~one read task per
            # core: each read task emits <= active x (k+ties) partial
            # rows, so fewer tasks shrink the merge input linearly
            n_cpus = max(8, int(ray.cluster_resources().get("CPU", 8)))
            kw = {"override_num_blocks": n_cpus} \
                if len(paths) > n_cpus else {}
            parts = ray.data.read_parquet(
                paths, columns=["image_id", "lon", "lat"], **kw
            ).map_batches(ring_partial, batch_format="pyarrow",
                          batch_size=65536)
            # merge: bounded partials + previous state — the driver
            # never gathers candidates either way. Small probe sets
            # take a SINGLE combine task: the candidate volume is
            # probes x (k+ties) x read-blocks and one task skips the
            # sort-shuffle's fixed cost (interleaved best-of-3 at
            # sf0.1/32cpus: 0.83 s vs 1.44 s at 200 probes); past the
            # threshold the serial merge loses to the probe-bucketed
            # distributed groupby (5.8 s vs 4.2 s at 2000) — measured
            # break-even ~512
            merged = parts if state is None else parts.union(state)
            if npr <= merge_gather_threshold:
                state = merged.repartition(1).map_batches(
                    merge_topk, batch_format="pyarrow",
                    batch_size=None).materialize()
            else:
                state = merged.groupby("part") \
                    .map_groups(merge_topk, batch_format="pyarrow") \
                    .repartition(min(n_parts, 8)).materialize()

            def rank_k_rows(batch: pa.Table) -> pa.Table:
                aidx = batch.column("aidx").to_numpy(zero_copy_only=False)
                rank = batch.column("rank").to_numpy(zero_copy_only=False)
                return batch.filter(pa.array(rank == pk_i64[aidx])) \
                    .select(["aidx", "dist"])

            kth_of = {int(r["aidx"]): float(r["dist"])
                      for r in state.map_batches(
                          rank_k_rows, batch_format="pyarrow").take_all()}
        # termination (the reference's cell-min-dist > kth-dist rule):
        # rings 0..ring_hi are read, so any unread point sits in a cell
        # at chebyshev > ring_hi — at least ring_hi cells away in lat OR
        # in lon.
        for p in list(active):
            if p not in kth_of:
                continue  # fewer than k candidates so far
            kth = kth_of[p]
            if metric == "haversine":
                # provable haversine lower bounds for unread points: from
                # a = sin2(dphi/2) + cos*cos*sin2(dlam/2),
                #   lat case:  d >= R * dphi_rad
                #   lon case:  d >= 2R * cos(phi_worst) * sin(dlam_rad/2)
                # (asin(x) >= x). Once rings wrap all of lon, only the
                # lat bound applies. 0.999 slop absorbs float rounding.
                R = 6_371_000.0
                lat_bound_m = R * np.radians(ring_hi * cell_h) * 0.999
                worst = abs(plat[p]) + (ring_hi + 1) * cell_h
                if ring_hi * 2 >= nx:
                    # lon fully wrapped: every unread point differs by
                    # > ring_hi cells in LATITUDE, so the lat bound alone
                    # is a valid lower bound
                    bound = lat_bound_m
                elif worst >= 90.0:
                    # the ring's latitude span reaches a pole: an unread
                    # same-row cell far in longitude can still be CLOSE
                    # (short path over the pole), so NO valid lower bound
                    # exists for the lon case — the probe must keep
                    # expanding until the rings wrap all longitudes
                    bound = 0.0
                else:
                    dlam = min(ring_hi * cell_w, 180.0)
                    lon_bound_m = (2.0 * R * np.cos(np.radians(worst))
                                   * np.sin(np.radians(dlam) / 2.0) * 0.999)
                    bound = min(lat_bound_m, lon_bound_m)
                if bound > 0.0 and kth <= bound:
                    active.discard(p)
            else:
                if kth <= (ring_hi * min_cell) ** 2:
                    active.discard(p)
        ring = ring_hi + 1

    # the ranked state IS the result (<= probes x k rows): trim ties
    # beyond rank k, map aidx -> probe_id, order by (probe, rank)
    if state is None:
        return pa.table({"probe_id": pa.array([], pa.string()),
                         "image_id": pa.array([], pa.string()),
                         "knn_rank": pa.array([], pa.int64())})
    # the RESULT set (bounded at probes x k rows); empty repartition
    # blocks carry a null schema — drop them before concat
    blocks = [b for b in ray.get(state.to_arrow_refs()) if b.num_columns]
    if not blocks:
        return pa.table({"probe_id": pa.array([], pa.string()),
                         "image_id": pa.array([], pa.string()),
                         "knn_rank": pa.array([], pa.int64())})
    t = pa.concat_tables(blocks)
    aidx = t.column("aidx").to_numpy(zero_copy_only=False)
    rank = t.column("rank").to_numpy(zero_copy_only=False)
    t = t.filter(pa.array(rank <= pk_i64[aidx]))
    aidx = t.column("aidx").to_numpy(zero_copy_only=False)
    rank = t.column("rank").to_numpy(zero_copy_only=False)
    order = np.lexsort((rank, aidx))
    ids_col = t.column("image_id")
    if isinstance(ids_col, pa.ChunkedArray):
        ids_col = ids_col.combine_chunks()
    pid_lookup = pa.array(pids, pa.string())
    return pa.table({
        "probe_id": pid_lookup.take(pa.array(aidx[order])),
        "image_id": ids_col.take(pa.array(order)),
        "knn_rank": pa.array(rank[order]),
    })
