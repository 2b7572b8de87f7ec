"""SpatialStore: cell-bucketed, sorted, manifest-committed parquet layout.

The Ray-Data analog of the reference's physical index tables: one logical
dataset materialized as a partitioned layout whose partition key is a Z2
cell prefix (reference pre-split tables + 128 MB tablet threshold,
``Z3Table.scala:162-170``, ``Splitters.scala:16-37``), with rows sorted by
(week, z3, image_id) inside each partition — the same sort order as the Z3
table row key (``Z3Table.scala:120-139``) — so scans prune partitions by
cell-prefix range and then benefit from sorted row groups.

Write path = the only all-to-all shuffle in the engine's ingest
(``groupby(bucket)``); each partition's writer commits parquet + lineage
manifest atomically, so killed runs restart by filtering completed buckets
BEFORE the shuffle (nothing is recomputed — FIXTURES.md F6 semantics).
Task retries are safe: a rewrite of the same bucket is byte-idempotent.

Read path: query -> covering Z2 ranges at bucket level -> only matching
``part=<bucket>`` directories are read -> coarse z3 + exact refine
(pipelines/scan.py kernels).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from geomesa_ray.curve.sfc import lonlat_to_xy, zranges_2d
from geomesa_ray.pipelines.scan import SpatialQuery, _ScanFilter, plan_query
from geomesa_ray.sources.io import read_images
from geomesa_ray.stages.encode import DEFAULT_CELL_LEVEL, derive_and_encode
from geomesa_ray.state.manifest import (
    commit_partition,
    commit_snapshot,
    completed_partitions,
    read_snapshot,
    skew_stats,
    write_manifest,
)

DEFAULT_BUCKET_LEVEL = 3  # 4^3 = 64 partitions; scale with cluster size


def add_bucket(batch: pa.Table, cell_level: int, bucket_level: int) -> pa.Table:
    cell = batch.column("cell").to_numpy(zero_copy_only=False)
    bucket = cell >> np.int64(2 * (cell_level - bucket_level))
    return batch.append_column("bucket", pa.array(bucket))


def _bucket_writer(out_dir: str, cell_level: int | None = None):
    """map_groups writer: sort partition by (week, z3, image_id), write
    parquet, commit manifest atomically; emits the manifest row.

    With ``cell_level`` given, the incoming group is SKINNY (ingest
    columns + bucket only — the shuffle ships ~half the bytes) and the
    derived columns (lon/lat/dtg/week/z3/cell, all pure functions of
    phash) are recomputed here, once per final partition. The bucket
    column is re-attached from the shuffle key, NOT recomputed — under
    salting the partition id is bucket*n_salt+salt and a recompute
    would silently unsalt it. Output schema and bytes are identical to
    shuffling the full rows (equality-verified by layout sha256 over
    the 19.2M-row corpus; measured 30.2 s -> 8.7 s at 32 cpus)."""

    def write_bucket(group: pa.Table) -> pa.Table:
        bucket = int(group.column("bucket")[0].as_py())
        if cell_level is not None:
            g = derive_and_encode(group.drop_columns(["bucket"]),
                                  cell_level)
            group = g.append_column("bucket", group.column("bucket"))
        g = group.sort_by([("week", "ascending"), ("z3", "ascending"),
                           ("image_id", "ascending")])
        n_cells = len(np.unique(g.column("cell").to_numpy(zero_copy_only=False)))
        payload = {
            "bucket": bucket,
            "rows": g.num_rows,
            "n_cells": n_cells,
            "week_min": int(np.min(g.column("week").to_numpy(zero_copy_only=False))),
            "week_max": int(np.max(g.column("week").to_numpy(zero_copy_only=False))),
        }
        commit_partition(out_dir, bucket, g, payload)
        return pa.table({
            "bucket": pa.array([bucket], pa.int64()),
            "rows": pa.array([g.num_rows], pa.int64()),
            "n_cells": pa.array([n_cells], pa.int64()),
        })

    return write_bucket


def salt_partition_ids(bucket: np.ndarray, phash: np.ndarray, n_salt: int,
                       hot_arr: np.ndarray) -> np.ndarray:
    """THE salt-assignment invariant, shared by write and append paths:
    partition id = bucket * n_salt + (splitmix64(phash ^ 0x5A17) % n_salt
    for hot buckets, else 0). Read paths assume exactly this mapping."""
    from geomesa_ray.sources.fixtures import splitmix64

    salt = (splitmix64(phash.view(np.uint64) ^ np.uint64(0x5A17))
            % np.uint64(n_salt)).astype(np.int64)
    salt = np.where(np.isin(bucket, hot_arr), salt, 0)
    return bucket * np.int64(n_salt) + salt


def _fixture_source(fixture_dir: str):
    """Default ingest source: the image fixture table."""

    def factory(columns: list[str], n_blocks: int | None = None):
        kw = {}
        if n_blocks is not None:
            kw["override_num_blocks"] = n_blocks
        return read_images(fixture_dir, columns=columns, **kw)

    return factory


def _store_source(src_dir: str):
    """Ingest source backed by an EXISTING store's live partitions —
    the input side of :func:`reindex_store` (a distributed scan of the
    committed layout, original columns projected back out)."""
    manifests = completed_partitions(src_dir)
    paths = [os.path.join(src_dir, f"part={b}", "data.parquet")
             for b in sorted(manifests, key=int)]
    if not paths:
        raise FileNotFoundError(f"{src_dir}: no committed partitions")

    def factory(columns: list[str], n_blocks: int | None = None):
        kw = {}
        if n_blocks is not None:
            kw["override_num_blocks"] = n_blocks
        return ray.data.read_parquet(paths, columns=columns, **kw)

    return factory


def bucket_counts(fixture_dir: str, cell_level: int,
                  bucket_level: int, source=None) -> dict[int, int]:
    """Per-bucket row histogram from a phash-only scan (the skew
    detector; reference precedent: pre-split planning from data stats)."""
    import pyarrow.compute as _pc

    ds = (source or _fixture_source(fixture_dir))(["phash"])
    ds = ds.map_batches(derive_and_encode, batch_format="pyarrow",
                        fn_kwargs={"cell_level": cell_level})
    ds = ds.map_batches(add_bucket, batch_format="pyarrow",
                        fn_kwargs={"cell_level": cell_level,
                                   "bucket_level": bucket_level})

    def partial(batch: pa.Table) -> pa.Table:
        u, c = np.unique(batch.column("bucket").to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"bucket": pa.array(u), "n": pa.array(c.astype(np.int64))})

    out: dict[int, int] = {}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        out[r["bucket"]] = out.get(r["bucket"], 0) + r["n"]
    return out


def write_store(fixture_dir: str, out_dir: str,
                cell_level: int = DEFAULT_CELL_LEVEL,
                bucket_level: int = DEFAULT_BUCKET_LEVEL,
                columns: list[str] | None = None,
                hot_rows_threshold: int | None = None,
                n_salt: int = 4, source=None) -> dict:
    """Ingest the image table into a cell-bucketed store. Returns skew/row
    metrics aggregated from the per-partition manifests.

    Resumable: buckets with committed manifests are filtered out before
    the shuffle; a killed run continues where it stopped.

    Skew: with ``hot_rows_threshold``, a phash-only histogram pre-pass
    finds buckets above the threshold and splits them into ``n_salt``
    salted partitions (partition id = bucket * n_salt + salt; unsalted
    buckets use salt 0) — the random-shard write-spreading precedent
    (``IndexSchema.scala:108-113``). The salt map is recorded in
    meta.json so reads expand bucket -> partition ids.
    """
    import ray

    os.makedirs(out_dir, exist_ok=True)
    done = {int(b) for b in completed_partitions(out_dir)}

    hot: set[int] = set()
    if hot_rows_threshold is not None:
        hist = bucket_counts(fixture_dir, cell_level, bucket_level,
                             source=source)
        hot = {b for b, n in hist.items() if n > hot_rows_threshold}

    # Resume guard: partition ids are only comparable across runs if the
    # partitioning scheme is identical — a killed unsalted run resumed
    # with salting (or different levels) would silently misattribute
    # committed partitions. The scheme is committed BEFORE any partition
    # writes; a mismatch on resume is an error, not silent data loss.
    need = columns if columns is not None else ["image_id", "phash", "caption"]
    scheme = {"cell_level": cell_level, "bucket_level": bucket_level,
              "salted": hot_rows_threshold is not None,
              "n_salt": n_salt if hot_rows_threshold is not None else 1,
              "hot_buckets": sorted(int(b) for b in hot),
              "columns": need}
    meta_path = os.path.join(out_dir, "meta.json")
    if done and os.path.exists(meta_path):
        prev = read_meta(out_dir)
        for k, v in scheme.items():
            if prev.get(k) != v:
                raise ValueError(
                    f"resume with different partitioning scheme: {k}={v} vs "
                    f"committed {prev.get(k)}; rerun with the original "
                    "parameters or use a fresh output dir")
    elif done and not os.path.exists(meta_path):
        raise ValueError(
            f"{out_dir} has committed partitions but no meta.json (written "
            "by pre-guard versions); use a fresh output dir")

    # commit the scheme BEFORE any partition writes so killed runs carry it
    _write_meta(out_dir, cell_level, bucket_level, need,
                salted=scheme["salted"], n_salt=n_salt,
                hot_buckets=scheme["hot_buckets"])

    # size read blocks to the cluster: the groupby(bucket) sort-shuffle
    # cost scales with block COUNT, not bytes — over-fragmented inputs
    # (Ray's default here: 147 blocks for 600k rows) made the shuffle 6x
    # slower than ~1 block per cpu. At real scale target the reference's
    # 128 MB partition precedent (Z3Table.scala:163) instead.
    n_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)))
    ds = (source or _fixture_source(fixture_dir))(need, n_blocks)

    # Skinny exchange: the all-to-all shuffle ships ONLY the ingest
    # columns + the bucket key. Every derived column (lon/lat/dtg/week/
    # z3/cell) is a pure function of phash, so shipping them doubles
    # shuffle bytes for nothing — the writer recomputes them per final
    # partition (3.5x ingest speedup at 32 cpus, byte-identical layout;
    # the reference's skinny index-value-vs-record split precedent,
    # ``IndexValueEncoder``).
    def add_bucket_key(batch: pa.Table) -> pa.Table:
        full = add_bucket(derive_and_encode(batch, cell_level),
                          cell_level, bucket_level)
        return batch.append_column("bucket", full.column("bucket"))

    ds = ds.map_batches(add_bucket_key, batch_format="pyarrow")
    if hot_rows_threshold is not None:
        hot_arr = np.array(sorted(hot), dtype=np.int64)

        def salt_buckets(batch: pa.Table) -> pa.Table:
            b = batch.column("bucket").to_numpy(zero_copy_only=False)
            ph = batch.column("phash").to_numpy(zero_copy_only=False)
            pid = salt_partition_ids(b, ph, n_salt, hot_arr)
            batch = batch.drop_columns(["bucket"])
            return batch.append_column("bucket", pa.array(pid))

        ds = ds.map_batches(salt_buckets, batch_format="pyarrow")
    if done:
        done_arr = pa.array(sorted(done), pa.int64())

        def drop_done(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            m = pc.is_in(batch.column("bucket"), value_set=done_arr)
            return batch.filter(pc.invert(m))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    out = ds.groupby("bucket").map_groups(
        _bucket_writer(out_dir, cell_level=cell_level),
        batch_format="pyarrow")
    out.count()  # drive the pipeline; manifests are the durable output
    manifests = completed_partitions(out_dir)
    return skew_stats(manifests)


def _write_meta(out_dir: str, cell_level: int, bucket_level: int,
                columns: list[str], salted: bool = False,
                n_salt: int = 1, hot_buckets: list[int] | None = None) -> None:
    """Store catalog record (the metadata-table analog of
    ``AccumuloDataStore.createSchema``, ``data/package.scala:36-52``):
    schema columns + partitioning spec, committed atomically."""
    import json
    import tempfile

    payload = {"cell_level": cell_level, "bucket_level": bucket_level,
               "columns": columns, "format": "parquet",
               "sort_key": ["week", "z3", "image_id"], "version": 1,
               "salted": salted, "n_salt": n_salt if salted else 1,
               "hot_buckets": hot_buckets or []}
    fd, tmp = tempfile.mkstemp(dir=out_dir, prefix=".meta_")
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, os.path.join(out_dir, "meta.json"))


def read_meta(out_dir: str) -> dict:
    import json

    with open(os.path.join(out_dir, "meta.json")) as f:
        return json.load(f)


def reindex_store(src_dir: str, dst_dir: str, *,
                  cell_level: int | None = None,
                  bucket_level: int | None = None,
                  columns: list[str] | None = None,
                  hot_rows_threshold: int | None = None,
                  n_salt: int = 4) -> dict:
    """Back-fill a NEW index layout from an existing store — the batch
    analog of the reference's index-maintenance MapReduce jobs:
    ``SortedIndexUpdateJob.scala:29-90`` (scan the live table, re-encode
    every entry under the current scheme, write back),
    ``AttributeIndexJob.scala`` (build a new index from stored records)
    and ``SchemaCopyJob.scala`` (copy a catalog to a new layout). The
    source of truth is the committed store itself — the original
    fixture files are NOT required, so a re-partition (new
    ``bucket_level`` for a grown cluster), a finer ``cell_level``, or
    newly-enabled hot-bucket salting can run against the store alone.

    Distributed end to end: one ``read_parquet`` over the source
    partitions (original columns projected back out of the layout),
    then the exact :func:`write_store` pipeline — scheme guard,
    pre-shuffle resume filter, single groupby shuffle, atomic
    per-partition manifests. A killed reindex resumes; the source is
    only ever read. Defaults for unspecified parameters come from the
    SOURCE's committed meta.json, so ``reindex_store(src, dst)`` is a
    faithful copy job."""
    if os.path.abspath(src_dir) == os.path.abspath(dst_dir):
        raise ValueError("reindex_store requires dst_dir != src_dir (the "
                         "source is immutable input; swap dirs after)")
    meta = read_meta(src_dir)
    return write_store(
        src_dir, dst_dir,
        cell_level=(cell_level if cell_level is not None
                    else meta["cell_level"]),
        bucket_level=(bucket_level if bucket_level is not None
                      else meta["bucket_level"]),
        columns=columns if columns is not None else meta["columns"],
        hot_rows_threshold=hot_rows_threshold, n_salt=n_salt,
        source=_store_source(src_dir))


def snapshot_store(out_dir: str) -> int:
    """Commit a versioned SNAPSHOT of the store's current state — the
    batch analog of the reference's Kafka replay surface
    (``ReplayKafkaConsumerFeatureSource.scala:32-72`` reads the stream's
    state as of a chosen time): each partition's current ``data.parquet``
    is pinned under an immutable versioned name via a HARDLINK (no data
    copy; the inode survives later in-place rewrites), and the
    partition -> file mapping is committed atomically under
    ``versions/v{N}.json``. ``read_store(version=N)`` then time-travels.
    """
    manifests = completed_partitions(out_dir)
    from geomesa_ray.state.manifest import list_versions

    ver = (list_versions(out_dir)[-1] + 1) if list_versions(out_dir) else 1
    files = {}
    for b in manifests:
        pdir = os.path.join(out_dir, f"part={b}")
        src = os.path.join(pdir, "data.parquet")
        dst_name = f"data_v{ver}.parquet"
        dst = os.path.join(pdir, dst_name)
        if os.path.exists(dst):
            # a crashed prior snapshot attempt may have left a link to a
            # SINCE-REWRITTEN inode; committing it would mix generations
            if os.stat(dst).st_ino != os.stat(src).st_ino:
                os.remove(dst)
                os.link(src, dst)
        else:
            os.link(src, dst)
        files[str(b)] = dst_name
    committed = commit_snapshot(out_dir, files)
    return committed


def _state_matches_snapshot(out_dir: str, snap: dict) -> bool:
    """True when every partition's live data.parquet is the same inode
    as the snapshot's pinned file (hardlink identity) and the partition
    sets agree — i.e. nothing changed since that snapshot."""
    manifests = completed_partitions(out_dir)
    if set(snap["files"]) != set(manifests):
        return False
    for b, fname in snap["files"].items():
        pdir = os.path.join(out_dir, f"part={b}")
        live = os.path.join(pdir, "data.parquet")
        pinned = os.path.join(pdir, fname)
        if not (os.path.exists(live) and os.path.exists(pinned)):
            return False
        if os.stat(live).st_ino != os.stat(pinned).st_ino:
            return False
    return True


def delete_store(out_dir: str, image_ids: list[str],
                 snapshot: bool = True) -> dict:
    """Delete features by id — the reference's ``FeatureWriter.remove``
    / removeFeatures path. Without a location the target bucket is
    unknown, so every partition is scanned ONCE, distributed (one task
    per partition, the same honest cost the reference pays on its
    record table when no index narrows the ids); only partitions that
    actually held a matching row are rewritten (tmp + rename, manifest
    recommitted). Pre/post snapshots make the delete replayable."""
    import ray

    from geomesa_ray.util import id_membership_mask

    if snapshot:
        from geomesa_ray.state.manifest import list_versions

        if not list_versions(out_dir) or not _state_matches_snapshot(
                out_dir, read_snapshot(out_dir)):
            snapshot_store(out_dir)
    ids_sorted = np.sort(np.asarray(list(image_ids), dtype=object))
    manifests = completed_partitions(out_dir)
    items = [{"bucket": int(b)} for b in manifests]
    ds = ray.data.from_items(items, override_num_blocks=max(1, len(items)))
    ref = ray.put(ids_sorted)

    def drop(batch: pa.Table) -> pa.Table:
        from geomesa_ray.util import resolve_broadcast

        targets = resolve_broadcast(ref)
        out_b, out_n = [], []
        for bucket in batch.column("bucket").to_pylist():
            pdir = os.path.join(out_dir, f"part={bucket}")
            path = os.path.join(pdir, "data.parquet")
            t = pq.read_table(path)
            m = id_membership_mask(t.column("image_id"), targets)
            n_hit = int(m.sum())
            if n_hit:
                kept = t.filter(pa.array(~m))
                tmp = os.path.join(pdir, ".data.parquet.tmp")
                pq.write_table(kept, tmp, row_group_size=65536)
                os.replace(tmp, path)
                if kept.num_rows:
                    n_cells = len(np.unique(
                        kept.column("cell").to_numpy(zero_copy_only=False)))
                    wk = kept.column("week").to_numpy(zero_copy_only=False)
                    wmin, wmax = int(np.min(wk)), int(np.max(wk))
                else:
                    # null week range for an emptied partition — 0/0
                    # would fabricate stats (see expire_store)
                    n_cells, wmin, wmax = 0, None, None
                write_manifest(out_dir, bucket, {
                    "bucket": bucket, "rows": kept.num_rows,
                    "n_cells": n_cells, "week_min": wmin,
                    "week_max": wmax})
            out_b.append(bucket)
            out_n.append(n_hit)
        return pa.table({"bucket": pa.array(out_b, pa.int64()),
                         "deleted": pa.array(out_n, pa.int64())})

    rows = ds.map_batches(drop, batch_format="pyarrow",
                          batch_size=1).take_all()
    out = {"deleted_rows": int(sum(r["deleted"] for r in rows)),
           "touched_buckets": int(sum(1 for r in rows if r["deleted"]))}
    if snapshot and out["deleted_rows"]:
        # a no-op delete changes nothing — don't mint a duplicate version
        out["snapshot_version"] = snapshot_store(out_dir)
    return out


def expire_store(out_dir: str, before_week: int,
                 snapshot: bool = True) -> dict:
    """Age-off: drop every feature whose ``week`` is older than
    ``before_week`` — the batch analog of the reference's feature
    expiration (``KafkaDataStore.scala:66`` ``expirationPeriod`` /
    ``LiveKafkaConsumerFeatureSource.scala:137-160`` cache
    ``expireAfterWrite`` + ``cleanUp``), expressed against the stored
    time key instead of wall-clock age so the operation is
    deterministic and replayable.

    Scale shape: the per-partition manifests record ``week_min`` /
    ``week_max``, so partitions entirely newer than the cutoff are
    SKIPPED without reading a byte; only candidate partitions get the
    one-task-per-partition distributed rewrite (tmp + rename +
    manifest recommit, same protocol as :func:`delete_store`). A
    partition expired to zero rows keeps an empty manifest (rows=0) so
    resume/pruning invariants hold. Pre/post snapshots make the
    age-off replayable via ``read_store(version=...)``."""
    import ray

    if snapshot:
        from geomesa_ray.state.manifest import list_versions

        if not list_versions(out_dir) or not _state_matches_snapshot(
                out_dir, read_snapshot(out_dir)):
            snapshot_store(out_dir)
    manifests = completed_partitions(out_dir)
    # manifest-level prune: only partitions that can hold expired rows;
    # rows==0 / null-week manifests (fully expired partitions) are never
    # candidates again
    candidates = [int(b) for b, m in manifests.items()
                  if m.get("rows", 0) != 0
                  and int(m["week_min"] if m.get("week_min") is not None
                          else -2**62) < before_week]
    out = {"expired_rows": 0, "touched_buckets": 0,
           "pruned_buckets": len(manifests) - len(candidates)}
    if candidates:
        items = [{"bucket": b} for b in sorted(candidates)]
        ds = ray.data.from_items(items, override_num_blocks=len(items))

        def drop_old(batch: pa.Table) -> pa.Table:
            out_b, out_n = [], []
            for bucket in batch.column("bucket").to_pylist():
                pdir = os.path.join(out_dir, f"part={bucket}")
                path = os.path.join(pdir, "data.parquet")
                t = pq.read_table(path)
                wk = t.column("week").to_numpy(zero_copy_only=False)
                m = wk < before_week
                n_hit = int(m.sum())
                if n_hit:
                    kept = t.filter(pa.array(~m))
                    tmp = os.path.join(pdir, ".data.parquet.tmp")
                    pq.write_table(kept, tmp, row_group_size=65536)
                    os.replace(tmp, path)
                    if kept.num_rows:
                        n_cells = len(np.unique(kept.column("cell")
                                      .to_numpy(zero_copy_only=False)))
                        kw = kept.column("week").to_numpy(
                            zero_copy_only=False)
                        wmin, wmax = int(np.min(kw)), int(np.max(kw))
                    else:
                        # empty partition: null week range (NOT 0/0 —
                        # fabricated stats would make it a permanent
                        # expire candidate and poison week-based pruning)
                        n_cells, wmin, wmax = 0, None, None
                    write_manifest(out_dir, bucket, {
                        "bucket": bucket, "rows": kept.num_rows,
                        "n_cells": n_cells, "week_min": wmin,
                        "week_max": wmax})
                out_b.append(bucket)
                out_n.append(n_hit)
            return pa.table({"bucket": pa.array(out_b, pa.int64()),
                             "expired": pa.array(out_n, pa.int64())})

        rows = ds.map_batches(drop_old, batch_format="pyarrow",
                              batch_size=1).take_all()
        out["expired_rows"] = int(sum(r["expired"] for r in rows))
        out["touched_buckets"] = int(sum(1 for r in rows if r["expired"]))
    if snapshot and out["expired_rows"]:
        out["snapshot_version"] = snapshot_store(out_dir)
    return out


def vacuum_store(out_dir: str, keep_last: int = 1) -> dict:
    """Retire old snapshot versions and garbage-collect their pinned
    files — the replay-surface cleanup the reference performs when a
    replay schema is removed (``KafkaDataStoreSchemaManager.scala:
    116-128`` deletes the replay topic; Kafka itself ages segments out
    by topic retention). Keeps the newest ``keep_last`` versions; every
    older ``versions/v{N}.json`` is removed, then each partition's
    ``data_v*.parquet`` hardlinks not referenced by any RETAINED
    version are unlinked. The live ``data.parquet`` name is never
    touched, and a pinned file shared by a retained version (same
    name) survives, so retained time-travel reads stay valid.

    Metadata-only driver op (no data scan, no task launch): O(versions
    + partitions) unlinks. Assumes the store's single-writer contract —
    vacuuming while a reader time-travels a retired version is a race
    the caller must not create (same contract as the reference's
    topic deletion). Returns counts and bytes actually freed (a
    hardlinked inode frees bytes only when its last name goes)."""
    import json

    from geomesa_ray.state.manifest import _versions_dir, list_versions

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the latest snapshot "
                         "is the append/delete replay anchor)")
    versions = list_versions(out_dir)
    retire = versions[:-keep_last]
    retained = versions[len(retire):]
    keep_names: set[tuple[str, str]] = set()
    for v in retained:
        snap = read_snapshot(out_dir, v)
        keep_names.update((str(b), f) for b, f in snap["files"].items())
    out = {"retired_versions": retire, "unlinked_files": 0,
           "freed_bytes": 0}
    # version records go first; a crash before the sweep leaves only
    # unreferenced orphan links, and re-running vacuum collects them
    # (the sweep scans partition dirs, not the retired jsons)
    for v in retire:
        os.remove(os.path.join(_versions_dir(out_dir), f"v{v}.json"))
    for b in completed_partitions(out_dir):
        pdir = os.path.join(out_dir, f"part={b}")
        for fname in os.listdir(pdir):
            if not (fname.startswith("data_v")
                    and fname.endswith(".parquet")):
                continue
            if (str(b), fname) in keep_names:
                continue
            st = os.stat(os.path.join(pdir, fname))
            os.remove(os.path.join(pdir, fname))
            out["unlinked_files"] += 1
            if st.st_nlink == 1:  # last name for the inode -> bytes freed
                out["freed_bytes"] += st.st_size
    return out


def read_store_changes(out_dir: str, v_from: int,
                       v_to: int | None = None) -> ray.data.Dataset:
    """Change-data-capture between two committed snapshots — the batch
    analog of the reference's live Kafka consumer reading new features
    past its offset (``LiveKafkaConsumerFeatureSource.scala:136-160``):
    one row per feature ADDED, UPDATED, or DELETED between version
    ``v_from`` and ``v_to`` (latest when None), with a ``change``
    column (deleted rows carry the OLD generation's values).

    Only partitions whose pinned file CHANGED between the versions are
    read (inode identity check, no data scan for untouched partitions);
    each changed partition diffs old vs new distributed, inside one
    map task per partition (partitions are the co-location unit, and an
    image_id never moves between them — phash immutability invariant).
    """
    snap_a = read_snapshot(out_dir, v_from)
    snap_b = read_snapshot(out_dir, v_to)
    work = []
    for b, fname_b in snap_b["files"].items():
        pdir = os.path.join(out_dir, f"part={b}")
        path_b = os.path.join(pdir, fname_b)
        fname_a = snap_a["files"].get(b)
        if fname_a is None:
            work.append((None, path_b))  # new partition: all rows added
            continue
        path_a = os.path.join(pdir, fname_a)
        if os.stat(path_a).st_ino != os.stat(path_b).st_ino:
            work.append((path_a, path_b))

    import ray

    if not work:
        return ray.data.from_arrow(pa.table({
            "image_id": pa.array([], pa.string()),
            "change": pa.array([], pa.string())}))

    items = [{"path_a": a or "", "path_b": b} for a, b in work]
    ds = ray.data.from_items(items, override_num_blocks=len(items))

    def diff(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from geomesa_ray.util import sorted_membership

        out = []
        for pa_path, pb_path in zip(batch.column("path_a").to_pylist(),
                                    batch.column("path_b").to_pylist()):
            new = pq.read_table(pb_path)
            new_ids = np.asarray(new.column("image_id").to_pylist(),
                                 dtype=object)
            if pa_path:
                old = pq.read_table(pa_path)
                old_ids = np.asarray(old.column("image_id").to_pylist(),
                                     dtype=object)
                order = np.argsort(old_ids)
                old_sorted_ids = old_ids[order]
                in_old = sorted_membership(new_ids, old_sorted_ids)
            else:
                old = None
                old_sorted_ids = np.empty(0, dtype=object)
                in_old = np.zeros(len(new_ids), dtype=bool)
            change = np.where(in_old, None, "added").astype(object)
            if old is not None and in_old.any():
                # vectorized row compare of the common ids: align old
                # rows to new order, pc.equal per column (null-safe)
                common = np.nonzero(in_old)[0]
                pos = np.searchsorted(old_sorted_ids, new_ids[common])
                take = pa.array(order[pos])
                differs = np.zeros(len(common), dtype=bool)
                for c in new.column_names:
                    eq = pc.equal(new.column(c).take(pa.array(common)),
                                  old.column(c).take(take))
                    if eq.null_count:  # null vs value -> differs
                        eq = pc.fill_null(eq, False)
                    differs |= ~eq.to_numpy(zero_copy_only=False)
                change[common[differs]] = "updated"
            keep_mask = np.array([c is not None for c in change])
            t = new.filter(pa.array(keep_mask))
            t = t.append_column("change", pa.array(
                [c for c in change if c is not None], pa.string()))
            out.append(t)
            if old is not None:
                # deletions: old ids absent from the new generation
                new_sorted = np.sort(new_ids)
                gone = ~sorted_membership(old_ids, new_sorted)
                if gone.any():
                    d = old.filter(pa.array(gone))
                    d = d.append_column("change", pa.array(
                        ["deleted"] * d.num_rows, pa.string()))
                    out.append(d)
        return pa.concat_tables(out)

    return ds.map_batches(diff, batch_format="pyarrow", batch_size=None)


def append_store(out_dir: str, new_images: pa.Table,
                 snapshot: bool = True) -> dict:
    """Incremental append/upsert: the batch analog of the reference's
    streaming surface (live cache updates / replay,
    ``LiveKafkaConsumerFeatureSource.scala:136-160``) — only the buckets
    touched by new rows are recomputed and atomically rewritten.

    With ``snapshot=True`` (default) the pre-append state is pinned as a
    versioned snapshot (if not already pinned) and the post-append state
    commits a new one, so ``read_store(version=...)`` can replay the
    store as of any committed generation.

    Upsert by ``image_id`` (new row wins), mirroring the reference's
    idempotent feature-id overwrite (``AccumuloFeatureWriter``), which
    also makes re-running an append a no-op.

    INVARIANT: an image_id's phash (hence its derived location and
    bucket) is immutable — true by construction here (phash is a content
    hash and location derives from it). An upsert only looks for the old
    row inside the bucket the NEW row maps to; changing an id's phash
    would strand the old row in its previous bucket. Location-changing
    updates require delete+append (not supported).
    """
    import ray
    import ray.data

    meta = read_meta(out_dir)
    cell_level = meta["cell_level"]
    bucket_level = meta["bucket_level"]
    n_salt = meta.get("n_salt", 1) if meta.get("salted") else 1

    if snapshot:
        from geomesa_ray.state.manifest import list_versions

        versions = list_versions(out_dir)
        if not versions or not _state_matches_snapshot(
                out_dir, read_snapshot(out_dir)):
            snapshot_store(out_dir)  # pin the pre-append state

    # same skinny exchange as write_store: ship ingest columns + bucket
    # key only; merge_bucket recomputes the derived columns per touched
    # partition (they're pure functions of phash)
    def add_bucket_key(batch: pa.Table) -> pa.Table:
        full = add_bucket(derive_and_encode(batch, cell_level),
                          cell_level, bucket_level)
        return batch.append_column("bucket", full.column("bucket"))

    ds = ray.data.from_arrow(new_images.select(meta["columns"]))
    ds = ds.map_batches(add_bucket_key, batch_format="pyarrow")
    if n_salt > 1:
        hot_arr = np.array(sorted(meta.get("hot_buckets", [])), dtype=np.int64)

        def salt(batch: pa.Table) -> pa.Table:
            b = batch.column("bucket").to_numpy(zero_copy_only=False)
            ph = batch.column("phash").to_numpy(zero_copy_only=False)
            pid = salt_partition_ids(b, ph, n_salt, hot_arr)
            batch = batch.drop_columns(["bucket"])
            return batch.append_column("bucket", pa.array(pid))

        ds = ds.map_batches(salt, batch_format="pyarrow")

    def merge_bucket(group: pa.Table) -> pa.Table:
        bucket = int(group.column("bucket")[0].as_py())
        # rebuild the full row from the skinny shuffle payload (bucket
        # from the shuffle key — recomputing would unsalt salted ids)
        g = derive_and_encode(group.drop_columns(["bucket"]), cell_level)
        group = g.append_column("bucket", group.column("bucket"))
        pdir = os.path.join(out_dir, f"part={bucket}")
        path = os.path.join(pdir, "data.parquet")
        if os.path.exists(path):
            from geomesa_ray.util import id_membership_mask

            new_ids = np.sort(np.asarray(
                group.column("image_id").to_pylist(), dtype=object))
            old = pq.read_table(path)
            keep = ~id_membership_mask(old.column("image_id"), new_ids)
            old = old.filter(pa.array(keep))
            merged = pa.concat_tables([old, group.select(old.schema.names)])
        else:
            merged = group
        merged = merged.sort_by([("week", "ascending"), ("z3", "ascending"),
                                 ("image_id", "ascending")])
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".data.parquet.tmp")
        pq.write_table(merged, tmp, row_group_size=65536)
        os.replace(tmp, path)
        n_cells = len(np.unique(merged.column("cell").to_numpy(zero_copy_only=False)))
        write_manifest(out_dir, bucket, {
            "bucket": bucket, "rows": merged.num_rows, "n_cells": n_cells,
            "week_min": int(np.min(merged.column("week").to_numpy(zero_copy_only=False))),
            "week_max": int(np.max(merged.column("week").to_numpy(zero_copy_only=False))),
        })
        return pa.table({"bucket": pa.array([bucket], pa.int64()),
                         "rows": pa.array([merged.num_rows], pa.int64())})

    touched = ds.groupby("bucket").map_groups(merge_bucket,
                                              batch_format="pyarrow").take_all()
    out = {"touched_buckets": len(touched),
           "rows_after": int(sum(r["rows"] for r in touched))}
    if snapshot:
        out["snapshot_version"] = snapshot_store(out_dir)
    return out


def store_buckets_for_query(query: SpatialQuery, bucket_level: int) -> set[int]:
    """Partition pruning: bucket ids whose Z2 prefix range intersects the
    query bbox."""
    ix0, iy0 = lonlat_to_xy(query.lon_min, query.lat_min, bucket_level, bucket_level)
    ix1, iy1 = lonlat_to_xy(query.lon_max, query.lat_max, bucket_level, bucket_level)
    ranges = zranges_2d(int(ix0), int(ix1), int(iy0), int(iy1), bucket_level)
    out = set()
    for lo, hi in ranges:
        out.update(range(lo, hi + 1))
    return out


def read_store(out_dir: str, query: SpatialQuery | None = None,
               bucket_level: int = DEFAULT_BUCKET_LEVEL,
               columns: list[str] | None = None,
               version: int | None = None,
               auths: list[str] | None = None) -> ray.data.Dataset:
    """Scan the store; with a query, prunes partitions then applies the
    coarse+exact filters on the stored key columns. With ``version``,
    time-travels: reads the immutable files of that committed snapshot
    (the replay surface — see :func:`snapshot_store`). Partition pruning
    stays valid across versions (bucket -> cell range is static).

    ``auths``: authorization labels for a store whose rows carry a
    ``vis`` visibility-expression column (see ``state.security``) —
    rows whose expression the auth set does not satisfy are filtered
    FIRST, before any query refinement, matching the reference's
    server-side visibility evaluation
    (``AuthorizationsProvider.scala`` / per-feature visibilities in
    ``AccumuloFeatureWriter.scala:63-96``). ``auths=None`` skips the
    filter entirely (the trusted-superuser path); pass ``[]`` to see
    only public rows. When auths are given, the projection must keep
    the ``vis`` column (enforced here by adding it to ``columns``)."""
    if version is not None:
        snap = read_snapshot(out_dir, version)
        files = {int(b): f for b, f in snap["files"].items()}
        buckets = sorted(files)
    else:
        files = None
        manifests = completed_partitions(out_dir)
        buckets = sorted(int(b) for b in manifests)
    if query is not None:
        try:
            meta = read_meta(out_dir)
            bucket_level = meta["bucket_level"]
            n_salt = meta.get("n_salt", 1) if meta.get("salted") else 1
        except FileNotFoundError:
            n_salt = 1
        keep = store_buckets_for_query(query, bucket_level)
        # salted layout: partition id = cell_bucket * n_salt + salt
        buckets = [b for b in buckets if (b // n_salt) in keep]
    paths = [os.path.join(out_dir, f"part={b}",
                          files[b] if files is not None else "data.parquet")
             for b in buckets]
    if not paths:
        import pyarrow as _pa

        return ray.data.from_arrow(_pa.table({"image_id": _pa.array([], _pa.string())}))
    read_kwargs = {}
    if query is not None:
        # row-group pushdown: partitions are SORTED by (week, z3), and
        # lon/lat are stored — parquet row-group min/max stats prune
        # within a partition before any batch is decoded (the sorted-
        # layout payoff, reference sorted-table seek analog)
        import pyarrow.compute as _pc

        expr = ((_pc.field("lon") >= query.lon_min)
                & (_pc.field("lon") <= query.lon_max)
                & (_pc.field("lat") >= query.lat_min)
                & (_pc.field("lat") <= query.lat_max))
        if query.t_start_s is not None:
            expr = expr & (_pc.field("dtg_s") >= query.t_start_s)
        if query.t_end_s is not None:
            expr = expr & (_pc.field("dtg_s") <= query.t_end_s)
        read_kwargs["filter"] = expr
    drop_vis = (auths is not None and columns is not None
                and "vis" not in columns)
    if drop_vis:
        columns = [*columns, "vis"]
    ds = ray.data.read_parquet(paths, columns=columns, **read_kwargs)
    if auths is not None:
        from geomesa_ray.state.security import apply_visibility

        ds = apply_visibility(ds, auths)
        if drop_vis:  # restore the caller's exact projection
            ds = ds.map_batches(lambda b: b.drop_columns(["vis"]),
                                batch_format="pyarrow")
    if query is not None:
        ds = ds.map_batches(_ScanFilter(plan_query(query)), batch_format="pyarrow")
    return ds
