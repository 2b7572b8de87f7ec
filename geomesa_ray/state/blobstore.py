"""Blob store: arbitrary byte payloads keyed by id, indexed spatially.

Reference parity: ``geomesa-blobstore/.../AccumuloBlobStore.scala:34-99``
stores blob BYTES in a dedicated table keyed by id (row = id, qualifier
= filename, value = bytes) and registers a skinny feature per blob
(``filename, storeId, geom, date`` — ``AccumuloBlobStore.scala:101-113``)
in a regular GeoMesa spatial index, so ``getIds(filter)`` finds blobs by
geometry/time and ``get(id)`` fetches the payload. File handlers derive
the geometry from put-params (``WKTFileHandler.scala``).

Ray-Data shape — the same two-table split, as two manifest-committed
parquet layouts under one directory:

* ``blobs/part=<h>/``  — payload partitions bucketed by the splitmix64
  hash of the blob id (``h = splitmix64(id_hash) % n_blob_parts``),
  sorted by blob_id: a point ``get`` touches exactly one partition and
  prunes row groups on the sorted id.
* ``index/part=<b>/`` — SKINNY spatial index rows (blob_id, filename,
  lon, lat, dtg_s, cell) bucketed by the level-``bucket_level`` Z2 cell
  prefix and sorted by (cell, blob_id) — ``get_ids`` prunes partitions
  with the same ``store_buckets_for_query`` Z2 range cover the main
  store uses, then row groups on the sorted cell.

The put is ONE chained pipeline over a ``ray.data.Dataset`` (a driver
``pa.Table`` is accepted and wrapped): payload rows shuffle by id-hash
to the payload writers, and each payload writer EMITS its group's
skinny index rows (no bytes) into a second, small shuffle that lands
the spatial index — the input is consumed exactly once and each
payload byte ships through exactly one exchange. Both layouts use the
store's atomic partition-commit protocol; each partition writer MERGES
into the existing file by blob_id upsert, so later puts add to
committed partitions and replaying a killed put is byte-idempotent
(layout bytes are identical across input block shapes — Dataset vs
driver table). A blob's geometry is immutable per id (the append_store
phash invariant's analog): a re-put that moved an id's lon/lat would
strand its old index row in the previous Z2 partition — location
changes require delete+put. At scale, payloads stream through the
object store block by block and the driver never materializes a byte.

Put-parameter handlers (geometry/date derivation per file) resolve
through a named registry — :data:`BLOB_HANDLERS` — the
``BlobStoreFileHandler`` SPI analog
(``geomesa-blobstore/.../BlobStoreFileHandler.scala``): ``wkt`` reads
put-params, ``exif`` reads the JPEG's own GPS directory.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from geomesa_ray.curve.sfc import Z2Grid
from geomesa_ray.sources.fixtures import splitmix64
from geomesa_ray.state.manifest import (commit_partition,
                                        completed_partitions, skew_stats)

DEFAULT_BLOB_PARTS = 64
DEFAULT_BUCKET_LEVEL = 3  # 4^3 = 64 spatial index partitions
INDEX_COLS = ["blob_id", "filename", "lon", "lat", "dtg_s", "cell"]
# payload partitions carry the skinny geometry alongside the bytes
# (16+8 B/row vs KB payloads) so a delete can resolve each id's Z2
# bucket from the payload side and rewrite ONLY the touched index
# partitions (layout version 2)
PAYLOAD_COLS = ["blob_id", "filename", "bytes", "lon", "lat", "dtg_s"]


def _blob_dir(root: str) -> str:
    return os.path.join(root, "blobs")


def _index_dir(root: str) -> str:
    return os.path.join(root, "index")


def _id_hashes(ids: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized 64-bit id hash (FNV-1a over utf-8, splitmix64
    finalizer) — the deterministic bucket key for blob partitions."""
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    s = ids.cast(pa.string())
    buf = np.frombuffer(s.buffers()[2], dtype=np.uint8) \
        if s.buffers()[2] is not None else np.empty(0, np.uint8)
    offs = np.frombuffer(s.buffers()[1], dtype=np.int32)[s.offset:
                                                         s.offset + len(s) + 1]
    h = np.full(len(s), 0xCBF29CE484222325, dtype=np.uint64)
    lens = np.diff(offs)
    with np.errstate(over="ignore"):
        for k in range(int(lens.max()) if len(lens) else 0):
            sel = lens > k
            h[sel] = (h[sel] ^ buf[offs[:-1][sel] + k]) \
                * np.uint64(0x100000001B3)
    return splitmix64(h).view(np.int64)


def blob_meta(root: str) -> dict:
    with open(os.path.join(root, "meta.json")) as f:
        return json.load(f)


def put_blobs(root: str, table: pa.Table | ray.data.Dataset,
              n_blob_parts: int = DEFAULT_BLOB_PARTS,
              bucket_level: int = DEFAULT_BUCKET_LEVEL,
              cell_level: int = 12) -> dict:
    """Distributed, resumable put. ``table`` is a driver ``pa.Table``
    (CLI-scale) or a ``ray.data.Dataset`` (bulk loads — payload bytes
    stream block-by-block, the driver never holds them); columns either
    way: blob_id (unique), filename, bytes (binary), lon, lat, dtg_s
    (int64 epoch seconds). Returns per-layout skew stats; partition
    bytes are identical for both input shapes. The put-param handlers
    (``WKTFileHandler`` role) live in :data:`BLOB_HANDLERS`."""
    ds = table if isinstance(table, ray.data.Dataset) else None
    names = ds.schema().names if ds is not None else table.column_names
    for c in PAYLOAD_COLS:
        if c not in names:
            raise ValueError(f"put_blobs: missing column {c!r}")
    os.makedirs(root, exist_ok=True)
    meta_path = os.path.join(root, "meta.json")
    scheme = {"n_blob_parts": n_blob_parts, "bucket_level": bucket_level,
              "cell_level": cell_level, "version": 2}
    if os.path.exists(meta_path):
        prev = blob_meta(root)
        if {k: prev.get(k) for k in scheme} != scheme:
            raise ValueError(
                f"resume with different blobstore scheme {scheme} vs "
                f"committed {prev}; use the original parameters")
    else:
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(scheme, f)
        os.replace(tmp, meta_path)

    bdir, idir = _blob_dir(root), _index_dir(root)
    grid = Z2Grid(cell_level)
    shift = np.int64(2 * (cell_level - bucket_level))

    # Each partition writer MERGES into any existing partition file,
    # upserting by blob_id (new row wins). A later put into an existing
    # store therefore ADDS its blobs (never silently drops rows whose
    # partition was committed by an earlier put), and replaying the
    # same put — crash recovery or task retry — is a byte-idempotent
    # rewrite, the same contract as the main store's append_store.
    def _merge_commit(base: str, part: int, g: pa.Table,
                      sort_keys) -> int:
        from geomesa_ray.util import id_membership_mask

        path = os.path.join(base, f"part={part}", "data.parquet")
        if os.path.exists(path):
            new_ids = np.sort(np.asarray(
                g.column("blob_id").to_pylist(), dtype=object))
            old = pq.read_table(path)
            old = old.filter(pa.array(
                ~id_membership_mask(old.column("blob_id"), new_ids)))
            g = pa.concat_tables([old, g.select(old.schema.names)])
        g = g.sort_by(sort_keys)
        commit_partition(base, part, g, {"part": part, "rows": g.num_rows})
        return g.num_rows

    # ---- chained pipeline: payload shuffle (bytes ship exactly once)
    # whose writers EMIT their group's skinny index rows into a second,
    # small shuffle — the input Dataset is consumed exactly once
    def add_hpart(batch: pa.Table) -> pa.Table:
        h = _id_hashes(batch.column("blob_id"))
        part = (h.view(np.uint64) % np.uint64(n_blob_parts)).astype(np.int64)
        return batch.select(PAYLOAD_COLS) \
                    .append_column("hpart", pa.array(part))

    def write_blob_part(group: pa.Table) -> pa.Table:
        part = int(group.column("hpart")[0].as_py())
        g = group.drop_columns(["hpart"])
        _merge_commit(bdir, part, g, [("blob_id", "ascending")])
        # emit THIS put's skinny index rows (no bytes) for the group
        lon = g.column("lon").to_numpy(zero_copy_only=False)
        lat = g.column("lat").to_numpy(zero_copy_only=False)
        cell = grid.encode(lon, lat)
        out = g.select(["blob_id", "filename", "lon", "lat", "dtg_s"])
        out = out.append_column("cell", pa.array(cell))
        return out.append_column("bpart", pa.array(cell >> shift))

    def write_index_part(group: pa.Table) -> pa.Table:
        part = int(group.column("bpart")[0].as_py())
        rows = _merge_commit(idir, part, group.drop_columns(["bpart"]),
                             [("cell", "ascending"),
                              ("blob_id", "ascending")])
        return pa.table({"part": pa.array([part], pa.int64()),
                         "rows": pa.array([rows], pa.int64())})

    if ds is None:
        n_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)))
        ds = ray.data.from_arrow(table).repartition(n_blocks)

    ds.map_batches(add_hpart, batch_format="pyarrow") \
        .groupby("hpart").map_groups(write_blob_part,
                                     batch_format="pyarrow") \
        .groupby("bpart").map_groups(write_index_part,
                                     batch_format="pyarrow").count()

    return {"blobs": skew_stats(completed_partitions(bdir)),
            "index": skew_stats(completed_partitions(idir))}


def get_blob(root: str, blob_id: str) -> tuple[bytes, str]:
    """Point fetch: (bytes, filename) — one partition file, row-group
    pruned on the sorted id (AccumuloBlobStore.get: one Range scan).
    Returns (b"", "") when absent, the reference's empty contract."""
    meta = blob_meta(root)
    h = _id_hashes(pa.array([blob_id]))[0]
    part = int(np.uint64(np.int64(h)) % np.uint64(meta["n_blob_parts"]))
    path = os.path.join(_blob_dir(root), f"part={part}", "data.parquet")
    if not os.path.exists(path):
        return b"", ""
    t = pq.read_table(path, filters=[("blob_id", "=", blob_id)])
    if t.num_rows == 0:
        return b"", ""
    return t.column("bytes")[0].as_py(), t.column("filename")[0].as_py()


def index_parts_for_bbox(root: str, bbox: tuple | None) -> list[int]:
    """Committed index partitions a bbox can touch (Z2 range cover at
    the index bucket level) — the pruning surface of :func:`get_ids`."""
    from geomesa_ray.pipelines.scan import SpatialQuery
    from geomesa_ray.state.store import store_buckets_for_query

    meta = blob_meta(root)
    parts = sorted(int(p) for p in completed_partitions(_index_dir(root)))
    if bbox is None:
        return parts
    want = store_buckets_for_query(SpatialQuery(*bbox),
                                   meta["bucket_level"])
    return [p for p in parts if p in want]


def get_ids(root: str, bbox: tuple | None = None,
            interval_s: tuple | None = None) -> ray.data.Dataset:
    """getIds(filter) analog: skinny index scan, partitions pruned by
    the Z2 range cover of the bbox, exact vectorized refine. Returns a
    Dataset of (blob_id, filename, lon, lat, dtg_s, cell)."""
    idir = _index_dir(root)
    paths = [os.path.join(idir, f"part={p}", "data.parquet")
             for p in index_parts_for_bbox(root, bbox)]
    if not paths:
        return ray.data.from_arrow(pa.table(
            {c: pa.array([], pa.string() if c in ("blob_id", "filename")
                         else pa.int64() if c in ("dtg_s", "cell")
                         else pa.float64()) for c in INDEX_COLS}))
    # columns= keeps Ray's hive-partition inference from injecting the
    # directory's part= key into the schema
    ds = ray.data.read_parquet(paths, columns=INDEX_COLS)

    def refine(batch: pa.Table) -> pa.Table:
        m = np.ones(batch.num_rows, dtype=bool)
        if bbox is not None:
            lon = batch.column("lon").to_numpy(zero_copy_only=False)
            lat = batch.column("lat").to_numpy(zero_copy_only=False)
            m &= (lon >= bbox[0]) & (lon <= bbox[1]) \
                & (lat >= bbox[2]) & (lat <= bbox[3])
        if interval_s is not None:
            t = batch.column("dtg_s").to_numpy(zero_copy_only=False)
            m &= (t >= interval_s[0]) & (t <= interval_s[1])
        return batch.filter(pa.array(m))

    if bbox is not None or interval_s is not None:
        ds = ds.map_batches(refine, batch_format="pyarrow")
    return ds


def fetch_blobs(root: str, ids: ray.data.Dataset | list) -> ray.data.Dataset:
    """Distributed batched fetch: ids group by their blob partition and
    each group reads ONLY its partition file, masked by id — the
    BatchMultiScanner role; no driver-side byte ever."""
    from geomesa_ray.util import id_membership_mask

    meta = blob_meta(root)
    n_parts = meta["n_blob_parts"]
    if isinstance(ids, list):
        ids = ray.data.from_arrow(pa.table({"blob_id":
                                            pa.array(ids, pa.string())}))

    def add_hpart(batch: pa.Table) -> pa.Table:
        h = _id_hashes(batch.column("blob_id"))
        part = (h.view(np.uint64) % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"blob_id": batch.column("blob_id"),
                         "hpart": pa.array(part)})

    def fetch(group: pa.Table) -> pa.Table:
        part = int(group.column("hpart")[0].as_py())
        path = os.path.join(_blob_dir(root), f"part={part}", "data.parquet")
        want = np.sort(np.asarray(group.column("blob_id").to_pylist(),
                                  dtype=object))
        if not os.path.exists(path):
            return pa.table({"blob_id": pa.array([], pa.string()),
                             "filename": pa.array([], pa.string()),
                             "bytes": pa.array([], pa.binary())})
        t = pq.read_table(path, columns=["blob_id", "filename", "bytes"])
        return t.filter(pa.array(id_membership_mask(t.column("blob_id"),
                                                    want)))

    keyed = ids.select_columns(["blob_id"]).map_batches(
        add_hpart, batch_format="pyarrow")
    return keyed.groupby("hpart").map_groups(fetch, batch_format="pyarrow")


def _drop_from_partitions(root: str, layout: str, parts: list[int],
                          want_ref) -> int:
    """Distributed partition rewrite: one Ray task stream over the given
    partitions, each dropping the broadcast ids and re-committing
    atomically. Returns the number of dropped rows."""
    if not parts:
        return 0

    def drop(batch: pa.Table) -> pa.Table:
        from geomesa_ray.state.manifest import write_manifest
        from geomesa_ray.util import id_membership_mask, resolve_broadcast

        want = resolve_broadcast(want_ref)
        out_n = []
        for part in batch.column("part").to_pylist():
            base = os.path.join(root, layout)
            pdir = os.path.join(base, f"part={part}")
            path = os.path.join(pdir, "data.parquet")
            n_hit = 0
            if os.path.exists(path):
                t = pq.read_table(path)
                m = id_membership_mask(t.column("blob_id"), want)
                n_hit = int(m.sum())
                if n_hit:
                    kept = t.filter(pa.array(~m))
                    tmp = os.path.join(pdir, ".data.parquet.tmp")
                    pq.write_table(kept, tmp, row_group_size=65536)
                    os.replace(tmp, path)
                    write_manifest(base, part, {"part": part,
                                                "rows": kept.num_rows})
            out_n.append(n_hit)
        return pa.table({"hit": pa.array(out_n, pa.int64())})

    rows = ray.data.from_items([{"part": p} for p in parts],
                               override_num_blocks=len(parts)) \
        .map_batches(drop, batch_format="pyarrow").take_all()
    return int(sum(r["hit"] for r in rows))


def delete_blobs(root: str, ids: list[str]) -> dict:
    """Delete payload + index rows for the given ids, rewriting ONLY the
    partitions the ids actually touch. Three distributed waves:

    1. **resolve** — the id-hash narrows the payload side to its
       buckets; each reads just (blob_id, lon, lat) (parquet column
       pruning never touches the bytes) and returns the Z2 index
       buckets of the matched rows;
    2. **index rewrite** — only the resolved buckets (v2 layouts;
       a v1 store without payload geometry falls back to all);
    3. **payload rewrite** — only the id-hash buckets.

    Untouched partitions are never opened for write. The order makes a
    killed delete replayable: payload rows outlive their index rows, so
    a re-run re-resolves the same buckets. The id set broadcasts once
    via ray.put."""
    meta = blob_meta(root)
    want = np.sort(np.array(ids, dtype=object))
    want_ref = ray.put(want)
    h = _id_hashes(pa.array(ids, pa.string()))
    bparts = sorted(set(
        (h.view(np.uint64) % np.uint64(meta["n_blob_parts"]))
        .astype(np.int64).tolist()))
    iparts_all = sorted(int(p) for p in
                        completed_partitions(_index_dir(root)))
    if not bparts:
        return {"deleted": 0}

    if meta.get("version", 1) >= 2:
        grid = Z2Grid(meta["cell_level"])
        shift = 2 * (meta["cell_level"] - meta["bucket_level"])

        def resolve(batch: pa.Table) -> pa.Table:
            from geomesa_ray.util import (id_membership_mask,
                                          resolve_broadcast)

            w = resolve_broadcast(want_ref)
            buckets: set[int] = set()
            for part in batch.column("part").to_pylist():
                path = os.path.join(_blob_dir(root), f"part={part}",
                                    "data.parquet")
                if not os.path.exists(path):
                    continue
                t = pq.read_table(path, columns=["blob_id", "lon", "lat"])
                t = t.filter(pa.array(
                    id_membership_mask(t.column("blob_id"), w)))
                if t.num_rows:
                    cell = grid.encode(
                        t.column("lon").to_numpy(zero_copy_only=False),
                        t.column("lat").to_numpy(zero_copy_only=False))
                    buckets.update((cell >> np.int64(shift)).tolist())
            return pa.table({"bucket": pa.array(sorted(buckets),
                                                pa.int64())})

        touched = {int(r["bucket"]) for r in ray.data.from_items(
            [{"part": p} for p in bparts], override_num_blocks=len(bparts))
            .map_batches(resolve, batch_format="pyarrow").take_all()}
        iparts = [p for p in iparts_all if p in touched]
    else:  # v1 payload layout has no geometry: scan every index part
        iparts = iparts_all

    _drop_from_partitions(root, "index", iparts, want_ref)
    deleted = _drop_from_partitions(root, "blobs", bparts, want_ref)
    return {"deleted": deleted}


def rows_from_exif(files: list[tuple[str, bytes]],
                   default_dtg_s: int = 0) -> pa.Table:
    """EXIF handler analog (``MetadataFileHandler.scala:24-45``): derive
    each blob's geometry (and DateTimeOriginal, closing the reference's
    date-extraction TODO) from the JPEG's own GPS directory. Files
    without a GPS directory are SKIPPED — the handler's
    ``canProcess=False`` contract (the WKT-params handler covers them)."""
    from geomesa_ray.codecs.exif import read_exif_gps

    kept, lons, lats, dtgs = [], [], [], []
    for name, data in files:
        gps = read_exif_gps(data)
        if gps is None:
            continue
        kept.append((name, data))
        lons.append(gps["lon"])
        lats.append(gps["lat"])
        dtgs.append(int(gps.get("dtg_s", default_dtg_s)))
    t = rows_from_params(kept, [{"wkt": "POINT (0 0)", "dtg_s": d}
                                for d in dtgs])
    t = t.set_column(t.schema.get_field_index("lon"), "lon",
                     pa.array(lons, pa.float64()))
    return t.set_column(t.schema.get_field_index("lat"), "lat",
                        pa.array(lats, pa.float64()))


def rows_from_params(files: list[tuple[str, bytes]],
                     params: list[dict]) -> pa.Table:
    """WKTFileHandler analog: build put_blobs rows from (filename, bytes)
    pairs + per-file params carrying ``wkt`` ('POINT (x y)') and
    ``dtg_s``. Blob id = filename stem + content-hash suffix (the
    handler's deterministic-id role)."""
    import re

    import hashlib

    lons, lats, ids, names, blobs, dtgs = [], [], [], [], [], []
    pat = re.compile(r"POINT\s*\(\s*(-?[\d.]+)\s+(-?[\d.]+)\s*\)")
    for (name, data), p in zip(files, params):
        m = pat.match(p["wkt"])
        if not m:
            raise ValueError(f"unsupported geometry (points only): "
                             f"{p['wkt']!r}")
        lons.append(float(m.group(1)))
        lats.append(float(m.group(2)))
        # full-content digest: same-name same-length files with
        # different bytes must get distinct ids
        h = hashlib.sha1(data).hexdigest()[:12]
        ids.append(f"{os.path.splitext(name)[0]}_{h}")
        names.append(name)
        blobs.append(data)
        dtgs.append(int(p["dtg_s"]))
    return pa.table({
        "blob_id": pa.array(ids, pa.string()),
        "filename": pa.array(names, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "lon": pa.array(lons, pa.float64()),
        "lat": pa.array(lats, pa.float64()),
        "dtg_s": pa.array(dtgs, pa.int64()),
    })


def _exif_handler(files: list[tuple[str, bytes]],
                  params: list[dict]) -> pa.Table:
    """Registry adapter for :func:`rows_from_exif`: geometry comes from
    each JPEG's GPS directory; a per-file ``dtg_s`` param is the
    fallback date for files whose EXIF has no DateTimeOriginal."""
    default = int(params[0].get("dtg_s", 0)) if params else 0
    return rows_from_exif(files, default_dtg_s=default)


# Named put-param handlers — the BlobStoreFileHandler SPI analog
# (``geomesa-blobstore/.../BlobStoreFileHandler.scala`` factories are
# discovered by ServiceLoader; here a plain registry, extendable the
# same way as functions/registry.py). Every handler maps
# (files: [(filename, bytes)], params: [dict]) -> a put_blobs row table.
BLOB_HANDLERS: dict = {
    "wkt": rows_from_params,
    "exif": _exif_handler,
}


def register_blob_handler(name: str, fn) -> None:
    """Extension point: plug a new put-param handler (the SPI role)."""
    if name in BLOB_HANDLERS:
        raise ValueError(f"blob handler {name!r} already registered")
    BLOB_HANDLERS[name] = fn


def resolve_blob_handler(name: str):
    try:
        return BLOB_HANDLERS[name]
    except KeyError:
        raise KeyError(f"unknown blob handler {name!r}; "
                       f"registered: {sorted(BLOB_HANDLERS)}") from None
