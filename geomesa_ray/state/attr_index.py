"""Secondary attribute index over a cell-bucketed store.

Reference parity: ``AttributeIndexJob`` builds attribute-index rows over
an existing table via a distributed job
(``geomesa-jobs/src/main/scala/org/locationtech/geomesa/jobs/index/AttributeIndexJob.scala:35-99``);
``AttributeTable.writer`` encodes one index row per non-null attribute
value (lexicoded value -> record id + "index value"), and
``AttributeIdxStrategy`` scans the value-sorted index then either decodes
covered rows directly (``IndexCoverage.FULL``,
``AttributeIdxStrategy.scala:85-104``) or joins back to the record table
(``IndexCoverage.JOIN``, the batched record-scan path).

Ray-Data shape
--------------
* **Build** (one bounded sample pass + ONE groupby shuffle): sample the
  column to derive range-partition boundaries (the lexicoded-sort-key
  analog — value ranges map to contiguous partitions, so range scans
  prune), assign each row its index partition via ``searchsorted``,
  ``groupby(apart).map_groups`` sorts each partition by value and commits
  it with the store's atomic manifest protocol — resumable exactly like
  ``write_store`` (committed partitions are filtered out BEFORE the
  shuffle on a re-run, and the scheme is meta-guarded).
* **Index rows** carry ``(value, image_id, bucket, lon, lat, dtg_s)`` —
  the ``IndexValueEncoder`` analog (geometry + dtg travel WITH the index
  entry), so spatio-temporal refinement runs on skinny index rows before
  any record payload is read. ``coverage="full"`` stores every store
  column instead, eliminating the record join (GeoMesa FULL coverage).
* **Query**: partitions are pruned by boundary binary-search plus
  per-partition manifest min/max, rows by parquet row-group stats (each
  partition is value-sorted) and an exact vectorized filter; JOIN
  coverage then groups the matched skinny rows by their source store
  bucket and each group reads ONLY its own store partition file and
  masks by id — a distributed batched record lookup with no driver-side
  id set and no full-store scan.

At 10^12 rows the build is one shuffle of skinny (value, id, bucket,
lon, lat, dtg) rows and queries touch O(selectivity) index partitions +
O(matched buckets) record partitions.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from geomesa_ray.state.manifest import (commit_partition,
                                        completed_partitions)

JOIN_COLUMNS = ["image_id", "bucket", "lon", "lat", "dtg_s"]


def _idx_dir(store_dir: str, col: str) -> str:
    return os.path.join(store_dir, "attr_idx", col)


def attr_index_exists(store_dir: str, col: str) -> bool:
    return os.path.exists(os.path.join(_idx_dir(store_dir, col),
                                       "meta.json"))


def read_idx_meta(store_dir: str, col: str) -> dict:
    with open(os.path.join(_idx_dir(store_dir, col), "meta.json")) as f:
        return json.load(f)


def _store_paths(store_dir: str) -> list[str]:
    manifests = completed_partitions(store_dir)
    return [os.path.join(store_dir, f"part={b}", "data.parquet")
            for b in sorted(manifests, key=int)]


def store_fingerprint(store_dir: str) -> str:
    """Cheap content fingerprint of the store's committed state:
    (partition, rows, file size) per partition. Appends, upserts,
    deletes, age-off and reindex all change at least one partition's
    rows or byte size, so a fingerprint mismatch means the index no
    longer reflects the store."""
    import hashlib

    manifests = completed_partitions(store_dir)
    items = []
    for b in sorted(manifests, key=int):
        path = os.path.join(store_dir, f"part={b}", "data.parquet")
        size = os.path.getsize(path) if os.path.exists(path) else -1
        items.append((b, manifests[b].get("rows"), size))
    return hashlib.sha256(json.dumps(items).encode()).hexdigest()[:16]


def attr_index_current(store_dir: str, col: str) -> bool:
    """True when the index exists AND was built from the store's
    CURRENT committed state (see :func:`store_fingerprint`). The engine
    only routes the ATTRIBUTE strategy through the index when this
    holds, so append()/delete() results stay visible to every strategy
    consistently."""
    if not attr_index_exists(store_dir, col):
        return False
    meta = read_idx_meta(store_dir, col)
    return meta.get("store_state") == store_fingerprint(store_dir)


def _sample_boundaries(paths: list[str], col: str, n_parts: int,
                       sample_per_block: int = 512,
                       max_sample_files: int = 16) -> list:
    """Range-partition cut points from a deterministic per-block sample
    (every ceil(n/sample)-th row of each block) — the driver holds only
    O(blocks x sample) values. Works for string and numeric columns
    alike (numpy object sort).

    The sample reads at most ``max_sample_files`` evenly-spaced
    partition files, not the whole store — at 10^5 partitions the
    boundary estimate needs a bounded read, and store partitions are
    spatially bucketed (attribute values are spread across them), so a
    spaced subset is representative. Boundaries are persisted in the
    index meta, so resume determinism never depends on this choice."""
    if len(paths) > max_sample_files:
        step = len(paths) / max_sample_files
        paths = [paths[int(i * step)] for i in range(max_sample_files)]

    def sample(batch: pa.Table) -> pa.Table:
        v = batch.column(col)
        n = len(v)
        if n == 0:
            return pa.table({col: v})
        step = max(1, n // sample_per_block)
        return pa.table({col: v.take(pa.array(range(0, n, step)))})

    ds = ray.data.read_parquet(paths, columns=[col])
    rows = ds.map_batches(sample, batch_format="pyarrow").take_all()
    vals = np.array([r[col] for r in rows if r[col] is not None],
                    dtype=object)
    if len(vals) == 0:
        raise ValueError(
            f"column {col!r} has no non-null values to index (the "
            "reference writer likewise emits no index rows for nulls)")
    vals.sort()
    cuts = []
    for i in range(1, n_parts):
        c = vals[(i * len(vals)) // n_parts]
        if not cuts or c > cuts[-1]:
            cuts.append(c)
    return [v.item() if isinstance(v, np.generic) else v for v in cuts]


def build_attr_index(store_dir: str, col: str, n_parts: int = 16,
                     coverage: str = "join") -> dict:
    """AttributeIndexJob analog: distributed, resumable secondary-index
    build over the committed store partitions. Returns per-partition
    row counts. Null attribute values are skipped (the reference writer
    emits no index mutation for null values)."""
    if coverage not in ("join", "full"):
        raise ValueError(f"coverage must be 'join' or 'full': {coverage}")
    paths = _store_paths(store_dir)
    if not paths:
        raise FileNotFoundError(f"{store_dir}: no committed partitions")
    idir = _idx_dir(store_dir, col)
    os.makedirs(idir, exist_ok=True)
    fp = store_fingerprint(store_dir)

    meta_path = os.path.join(idir, "meta.json")
    if os.path.exists(meta_path) \
            and read_idx_meta(store_dir, col).get("store_state") != fp:
        # the store changed since this index was built (append / delete
        # / age-off / reindex): a resume would silently MISS rows whose
        # value lands in an already-committed index partition, so the
        # derived index is wiped and rebuilt from the current state.
        # Crash-safety: rmtree deletes children in arbitrary order, so a
        # crash mid-wipe could remove meta.json but leave part= dirs —
        # which the next build would RESUME as done under freshly
        # resampled boundaries (silent corruption). Rename the dir aside
        # first (atomic), then delete at leisure.
        import shutil

        trash = f"{idir}.stale-{os.getpid()}"
        shutil.rmtree(trash, ignore_errors=True)
        os.rename(idir, trash)
        shutil.rmtree(trash, ignore_errors=True)
        os.makedirs(idir)
    done = {int(p) for p in completed_partitions(idir)}

    if os.path.exists(meta_path):
        meta = read_idx_meta(store_dir, col)
        if meta["n_parts"] != n_parts or meta["coverage"] != coverage:
            raise ValueError(
                f"resume with different index scheme: n_parts={n_parts} "
                f"coverage={coverage} vs committed {meta['n_parts']}/"
                f"{meta['coverage']}; use the original parameters or "
                "remove the index dir")
        cuts = meta["boundaries"]
    else:
        cuts = _sample_boundaries(paths, col, n_parts)
        meta = {"col": col, "n_parts": n_parts, "coverage": coverage,
                "boundaries": cuts, "store_state": fp,
                "store_partitions": len(paths)}
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, meta_path)

    # numeric boundary values searchsort natively (no per-row Python
    # conversion). EXACT dtypes only: int64 cuts for an int column,
    # float64 for a float column — a lossy cast (e.g. a 64-bit hash
    # through float64) could route a boundary row to a different
    # partition than parts_for_predicate's Python-int comparison prunes,
    # silently dropping it from range scans. Strings and anything mixed
    # keep the object-dtype path.
    cuts_arr = np.array(cuts, dtype=object)
    if cuts and all(isinstance(c, int) and not isinstance(c, bool)
                    for c in cuts) \
            and all(-2**63 <= c < 2**63 for c in cuts):
        cuts_arr = np.array(cuts, dtype=np.int64)
    elif cuts and all(isinstance(c, float) for c in cuts):
        cuts_arr = np.array(cuts, dtype=np.float64)
    need = None if coverage == "full" else \
        list(dict.fromkeys([col, *JOIN_COLUMNS]))

    def assign(batch: pa.Table) -> pa.Table:
        if need is not None:
            batch = batch.select(need)
        batch = batch.filter(pc.is_valid(batch.column(col)))
        c_arr = batch.column(col)
        if cuts_arr.dtype == np.int64 \
                and pa.types.is_integer(c_arr.type) \
                and not pa.types.is_unsigned_integer(c_arr.type):
            v = c_arr.to_numpy(zero_copy_only=False)
        elif cuts_arr.dtype == np.float64 \
                and pa.types.is_floating(c_arr.type):
            v = c_arr.to_numpy(zero_copy_only=False)
        else:
            v = np.asarray(c_arr.to_pylist(), dtype=object)
        apart = np.searchsorted(cuts_arr, v, side="right") \
            if len(cuts_arr) else np.zeros(len(v), dtype=np.int64)
        return batch.append_column("apart",
                                   pa.array(apart.astype(np.int64)))

    def drop_done(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch.column("apart"),
                     value_set=pa.array(sorted(done), pa.int64()))
        return batch.filter(pc.invert(m))

    def write_part(group: pa.Table) -> pa.Table:
        part = int(group.column("apart")[0].as_py())
        g = group.drop_columns(["apart"]).sort_by(
            [(col, "ascending"), ("image_id", "ascending")])
        vcol = g.column(col)
        payload = {"part": part, "rows": g.num_rows,
                   "vmin": vcol[0].as_py(),
                   "vmax": vcol[-1].as_py()}
        commit_partition(idir, part, g, payload)
        return pa.table({"part": pa.array([part], pa.int64()),
                         "rows": pa.array([g.num_rows], pa.int64())})

    n_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)))
    ds = ray.data.read_parquet(paths, columns=need,
                               override_num_blocks=n_blocks)
    ds = ds.map_batches(assign, batch_format="pyarrow")
    if done:
        ds = ds.map_batches(drop_done, batch_format="pyarrow")
    out = ds.groupby("apart").map_groups(write_part,
                                         batch_format="pyarrow")
    out.count()  # drive; manifests are the durable output
    return {int(p): m for p, m in completed_partitions(idir).items()}


def _value_filter(col: str, eq=None, lo=None, hi=None,
                  lo_strict=False, hi_strict=False):
    """(parquet pushdown expr, exact batch mask fn) for the predicate.
    Bounds are closed unless the matching ``*_strict`` flag opens them;
    either bound may be None."""
    def _pushable(v):
        # a float literal beyond 2^53 against an integer column makes
        # Arrow's implicit cast raise — drop that bound from the
        # row-group pushdown (the exact mask below still enforces it)
        return not (isinstance(v, float) and abs(v) > 2.0 ** 53)

    if eq is None and lo is None and hi is None:
        raise ValueError("one of eq / lo / hi is required")
    # eq and a range CAN both be present (e.g. CQL "w = 5 AND w > 3"):
    # they compose by AND, same as the scan path
    expr = None
    if eq is not None and _pushable(eq):
        expr = pc.field(col) == eq
    if lo is not None and _pushable(lo):
        e = (pc.field(col) > lo) if lo_strict else (pc.field(col) >= lo)
        expr = e if expr is None else expr & e
    if hi is not None and _pushable(hi):
        e = (pc.field(col) < hi) if hi_strict else (pc.field(col) <= hi)
        expr = e if expr is None else expr & e

    def mask(batch: pa.Table) -> pa.Table:
        import numpy as np

        from geomesa_ray.cql import eq_mask, range_mask

        m = np.ones(batch.num_rows, dtype=bool)
        if eq is not None:
            m &= eq_mask(batch, col, eq)
        if lo is not None or hi is not None:
            m &= range_mask(batch, col, (lo, hi, lo_strict, hi_strict))
        return batch.filter(pa.array(m))

    return expr, mask


def parts_for_predicate(store_dir: str, col: str, eq=None, lo=None,
                        hi=None) -> list[int]:
    """Index partitions a predicate can touch: boundary binary-search
    picks the contiguous partition range, per-partition manifest
    vmin/vmax prunes further."""
    meta = read_idx_meta(store_dir, col)
    cuts = np.array(meta["boundaries"], dtype=object)
    want_lo = eq if eq is not None else lo
    want_hi = eq if eq is not None else hi
    p0 = int(np.searchsorted(cuts, want_lo, side="right")) \
        if (want_lo is not None and len(cuts)) else 0
    p1 = int(np.searchsorted(cuts, want_hi, side="right")) \
        if (want_hi is not None and len(cuts)) else len(cuts)
    idir = _idx_dir(store_dir, col)
    parts = []
    for p, m in completed_partitions(idir).items():
        ip = int(p)
        if ip < p0 or ip > p1:
            continue
        if want_lo is not None and m["vmax"] < want_lo:
            continue
        if want_hi is not None and m["vmin"] > want_hi:
            continue
        parts.append(ip)
    return sorted(parts)


def read_attr_index(store_dir: str, col: str, eq=None, lo=None,
                    hi=None, lo_strict=False,
                    hi_strict=False) -> ray.data.Dataset:
    """Value-pruned scan of the index rows: partition pruning via
    :func:`parts_for_predicate` (closed-bound superset — safe for
    strict bounds), row-group pruning via parquet stats (value-sorted
    layout), then an exact vectorized filter."""
    parts = parts_for_predicate(store_dir, col, eq, lo, hi)
    idir = _idx_dir(store_dir, col)
    if not parts:
        manifests = completed_partitions(idir)
        schema_path = os.path.join(
            idir, f"part={next(iter(manifests))}", "data.parquet") \
            if manifests else None
        if schema_path is None:
            raise FileNotFoundError(f"{idir}: no committed partitions")
        import pyarrow.parquet as pq

        return ray.data.from_arrow(
            pq.read_schema(schema_path).empty_table())
    paths = [os.path.join(idir, f"part={p}", "data.parquet")
             for p in sorted(parts)]
    expr, mask = _value_filter(col, eq, lo, hi, lo_strict, hi_strict)
    ds = ray.data.read_parquet(paths, filter=expr)
    return ds.map_batches(mask, batch_format="pyarrow")


def query_attr_index(store_dir: str, col: str, eq=None, lo=None, hi=None,
                     lo_strict=False, hi_strict=False, query=None,
                     columns: list[str] | None = None) -> ray.data.Dataset:
    """AttributeIdxStrategy analog: index scan -> secondary
    spatio-temporal refinement on the carried index value (lon/lat/dtg_s)
    -> FULL-coverage decode or JOIN-coverage distributed record fetch.

    ``query``: optional :class:`~geomesa_ray.stages.encode.SpatialQuery`
    applied to the index rows BEFORE any record read (the reference
    evaluates its secondary filter on the decoded index value,
    ``AttributeIdxStrategy.scala:85-120``).

    JOIN fetch shape: matched skinny rows group by source ``bucket``;
    each group reads only ITS store partition file and masks by id
    (vectorized membership) — the batched record-scanner analog. No
    driver-side id set at any point.
    """
    meta = read_idx_meta(store_dir, col)
    idx = read_attr_index(store_dir, col, eq, lo, hi, lo_strict, hi_strict)

    if query is not None:
        from geomesa_ray.pipelines.scan import exact_mask

        def refine(batch: pa.Table) -> pa.Table:
            lon = batch.column("lon").to_numpy(zero_copy_only=False)
            lat = batch.column("lat").to_numpy(zero_copy_only=False)
            dtg = batch.column("dtg_s").to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(exact_mask(query, lon, lat, dtg)))

        idx = idx.map_batches(refine, batch_format="pyarrow")

    if meta["coverage"] == "full":
        return idx.select_columns(columns) if columns else idx

    idx_cols = set(dict.fromkeys([col, *JOIN_COLUMNS]))
    if columns and set(columns) <= idx_cols:
        # requested projection is covered by the index value itself —
        # no record join needed (the covered-query fast path)
        return idx.select_columns(columns)

    from geomesa_ray.util import id_membership_mask

    read_cols = None
    if columns is not None:
        read_cols = list(dict.fromkeys(["image_id", *columns]))

    def fetch(group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        bucket = int(group.column("bucket")[0].as_py())
        ids = np.sort(np.asarray(group.column("image_id").to_pylist(),
                                 dtype=object))
        t = pq.read_table(
            os.path.join(store_dir, f"part={bucket}", "data.parquet"),
            columns=read_cols)
        t = t.filter(pa.array(id_membership_mask(t.column("image_id"),
                                                 ids)))
        return t.select(columns) if columns is not None else t

    skinny = idx.select_columns(["image_id", "bucket"])
    return skinny.groupby("bucket").map_groups(fetch,
                                               batch_format="pyarrow")
